"""Regenerate the full sf10 correctness matrix, sharded — one command.

Codifies the 3-way shard-and-merge protocol that produced the round-9
``CORRECTNESS_local_sf10.json`` (315/315 value-certified in ~95 min
wall on local[32]); previously it was reconstructable only from
PERF.md prose (judge r9 task #5). The protocol, and why each piece
exists:

1. **Data**: ``/tmp/sf10`` is scratch (not persistent across
   sessions) — regenerated via ``tools/make_sf1.py /tmp/sf10
   --replicas 100`` (~60M lineitem / 500k docs) unless already
   present.
2. **Shard**: the 315 query names are split round-robin (sorted order,
   ``i % workers``) across N worker subprocesses, each running
   ``tools/verify_oracle.py <sf_dir> <names...>``. Round-robin mixes
   slow and fast families evenly, so shards finish together.
3. **Per-worker isolation knobs** (all learned from real failures):
   - ``SPARK_GRAFT_DUCK_MEM`` (default 20GB): DuckDB defaults to 80%
     of RAM *per process*; three workers at default OOM the box.
   - ``SPARK_GRAFT_DUCK_TMP`` (per-worker dir): concurrent DuckDB
     processes default to the same ``<cwd>/.tmp`` spill dir and
     clobber each other's temp files — observed as IO errors and one
     SIGABRT before the fix. Spills can reach ~70 GB per worker at
     sf10: watch free disk when raising ``--workers``.
   - ``SPARK_GRAFT_CPUS`` (default 12): three local[12] Spark JVMs
     oversubscribe 32 cores mildly — better than three local[32]
     fighting for everything.
   - ``--oracle-timeout 1800``: the deliberately-naive oracle
     formulations are allowed half an hour before the watchdog
     interrupts them (a TIMEOUT is recorded, never silently dropped).
4. **Tier flags**: ``--dist-hash fuzzy_name_pairs`` — its 372M-row
   pair output is value-certified by the distributed md5 fold instead
   of materializing through pandas.
5. **Merge**: worker logs are concatenated (CR-stripped — Spark
   progress bars inject ``\\r``) and a final UNSHARDED pass runs with
   ``--resume merged.log``: every recorded PASS/PASS-DIST/TIMEOUT is
   reused, anything missing or FAILed re-runs (the round-9 transient —
   a DuckDB spill hitting no-space under three concurrent spills —
   healed exactly this way), and the pass writes
   ``CORRECTNESS_local_sf10.json`` with counters recomputed from the
   merged statuses.

Usage::

    python tools/run_sf10_matrix.py                  # full protocol
    python tools/run_sf10_matrix.py --workers 2 --duck-mem 30GB
    python tools/run_sf10_matrix.py --sf-dir /tmp/sf1 --replicas 10

Exit status is the final merge pass's (0 = every query certified).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query_names() -> list[str]:
    """The declared query surface, WITHOUT starting a SparkSession
    (the registry import is metadata-only)."""
    sys.path.insert(0, REPO)
    from bikes_data_warehouse_etl_spark.plans import QUERIES

    return sorted(QUERIES)


def ensure_data(sf_dir: str, replicas: int) -> None:
    if os.path.isdir(sf_dir) and os.listdir(sf_dir):
        print(f"[matrix] {sf_dir} exists — skipping datagen")
        return
    print(f"[matrix] generating {sf_dir} (--replicas {replicas})")
    subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "make_sf1.py"),
            sf_dir,
            "--replicas",
            str(replicas),
        ],
        check=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/tmp/sf10")
    ap.add_argument("--replicas", type=int, default=100)
    ap.add_argument("--workers", type=int, default=3)
    ap.add_argument("--duck-mem", default="20GB")
    ap.add_argument("--cpus-per-worker", default="12")
    ap.add_argument("--oracle-timeout", default="1800")
    ap.add_argument(
        "--dist-hash",
        default="fuzzy_name_pairs",
        help="comma list passed through to verify_oracle (its output "
        "is too large to materialize; '' disables)",
    )
    ap.add_argument(
        "--work-dir",
        default=None,
        help="log/spill scratch (default /tmp/<sf-dir-name>__matrix_work"
        " — never beside the data: read-only trees like /root/testdata"
        " must stay untouched)",
    )
    ap.add_argument(
        "--merge-only",
        action="store_true",
        help="skip the shard runs and merge existing worker logs "
        "(e.g. after re-running one query by hand)",
    )
    args = ap.parse_args()

    work = args.work_dir or os.path.join(
        "/tmp",
        os.path.basename(args.sf_dir.rstrip("/")) + "__matrix_work",
    )
    os.makedirs(work, exist_ok=True)
    verify = os.path.join(REPO, "tools", "verify_oracle.py")
    tier_flags = (
        ["--dist-hash", args.dist_hash] if args.dist_hash else []
    )

    ensure_data(args.sf_dir, args.replicas)

    names = query_names()
    log_paths = [
        os.path.join(work, f"shard{i}.log") for i in range(args.workers)
    ]
    if not args.merge_only:
        t0 = time.time()
        procs = []
        for i in range(args.workers):
            shard = names[i :: args.workers]
            env = dict(
                os.environ,
                SPARK_GRAFT_DUCK_MEM=args.duck_mem,
                SPARK_GRAFT_DUCK_TMP=os.path.join(work, f"duck_tmp{i}"),
                SPARK_GRAFT_CPUS=args.cpus_per_worker,
            )
            logf = open(log_paths[i], "w")
            print(
                f"[matrix] shard {i}: {len(shard)} queries → "
                f"{log_paths[i]}"
            )
            procs.append(
                (
                    subprocess.Popen(
                        [sys.executable, verify, args.sf_dir, *shard]
                        + tier_flags
                        + ["--oracle-timeout", args.oracle_timeout],
                        stdout=logf,
                        stderr=subprocess.DEVNULL,
                        env=env,
                    ),
                    logf,
                )
            )
        for i, (p, logf) in enumerate(procs):
            rc = p.wait()
            logf.close()
            print(f"[matrix] shard {i} exited rc={rc}")
        print(f"[matrix] shards done in {time.time() - t0:.0f}s")

    # merge: CR-strip + concatenate, then one unsharded --resume pass
    # (reuses every recorded PASS/PASS-DIST/TIMEOUT, re-runs anything
    # missing or FAILed, writes the CORRECTNESS artifact)
    merged = os.path.join(work, "merged.log")
    with open(merged, "w") as out:
        for lp in log_paths:
            if os.path.exists(lp):
                with open(lp) as f:
                    out.write(f.read().replace("\r", ""))
    env = dict(
        os.environ,
        SPARK_GRAFT_DUCK_MEM=args.duck_mem,
        SPARK_GRAFT_DUCK_TMP=os.path.join(work, "duck_tmp_merge"),
    )
    print(f"[matrix] merge pass (--resume {merged})")
    rc = subprocess.run(
        [sys.executable, verify, args.sf_dir]
        + tier_flags
        + ["--oracle-timeout", args.oracle_timeout, "--resume", merged],
        env=env,
    ).returncode
    print(f"[matrix] done rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
