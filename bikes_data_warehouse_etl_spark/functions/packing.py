"""Guarded 8-byte pair packing for wide pair shuffles.

Several pair-census plans (co_order_edges, copurchase_pairs,
assoc_rules_topk) ship each canonical a<b key pair through their widest
exchange as ONE packed long ``a·2^32 + b`` instead of two columns. The
packing is injective only while both keys sit in ``[0, 2^31)`` — the
schema guarantees that today (TPC-H 32-bit keys; tools/make_sf1.py
replica offsets < 2^24), but a silent domain change would MERGE
DISTINCT PAIRS and corrupt counts without any error.

This helper makes the bound a runtime contract at the pack site:
every key is routed through ``assert_true`` before the shift, so a
key outside the domain fails the query loudly instead of corrupting
results. The guard is two codegen'd long comparisons per element —
noise against the pair shuffle it protects.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Injectivity domain for shiftleft(x, 32) + y packing. 2^31 (not 2^32)
# for BOTH halves: the stricter uniform bound keeps the packed value
# positive and leaves headroom for sign-sensitive consumers.
PACK_KEY_DOMAIN = 1 << 31

_ERR = "pair packing requires keys in [0, 2^31) - key domain grew, widen the pack"


def _checked(v: str) -> str:
    """SQL fragment: ``v`` as BIGINT, raising if outside the domain.
    assert_true yields NULL on pass, so coalesce falls through to the
    cast value; on fail it raises before any pair is emitted."""
    return (
        f"coalesce(cast(assert_true({v} >= 0 and {v} < {PACK_KEY_DOMAIN}, "
        f"'{_ERR}') as bigint), cast({v} as bigint))"
    )


def packed_pairs_expr(arr: str) -> str:
    """SQL expression producing the array of canonical a<b pairs of
    array column ``arr``, each packed as one guarded 8-byte long."""
    return (
        f"flatten(transform({arr}, x -> "
        f"transform(filter({arr}, y -> x < y), "
        f"y -> shiftleft({_checked('x')}, 32) + {_checked('y')})))"
    )


def explode_packed_pairs(arr: str, alias: str = "ab") -> Column:
    """``F.explode`` of :func:`packed_pairs_expr`, aliased."""
    return F.explode(F.expr(packed_pairs_expr(arr))).alias(alias)


def unpack_hi(packed: str) -> Column:
    return F.shiftright(packed, 32)


def unpack_lo(packed: str) -> Column:
    return F.expr(f"{packed} & 4294967295")
