"""Python UDTFs (Spark 4 user-defined TABLE functions) — the row→rows
extension point for parse-into-records logic that a declarative
explode cannot express cleanly.

Policy (same as the pandas-UDF surface, plans/analytics.py): nothing
on the oracle-parity path uses a UDTF — every parity query is
built-in-function only. UDTFs are for imperative parsers whose state
machine doesn't decompose into per-element lambdas: the demo here is
sentence segmentation with abbreviation and decimal-number lookahead
(a '.' ends a sentence UNLESS it trails a known abbreviation or sits
inside a number), which in pure SQL becomes an unmaintainable
regex-lookahead thicket.

Scale: a UDTF runs one Python process per core with rows streamed
through — row-at-a-time, so it is the SLOW path (~10-100x vs
builtins); acceptable for parse-once ingestion, wrong for hot
analytical loops. Register with ``spark.udtf.register`` and call in
SQL via ``LATERAL``, or call the class directly over a column.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

ABBREVIATIONS = {"mr", "mrs", "dr", "vs", "etc", "e.g", "i.e", "st", "no"}


@udtf(returnType="sentence_idx int, sentence string, n_tokens int")
class SentenceSplit:
    """Yield (sentence_idx, sentence, n_tokens) rows for one text.

    A '.' / '!' / '?' closes a sentence unless the '.' terminates a
    known abbreviation or is a decimal point between digits — the
    carry-over decisions that make this a parser, not a split().
    """

    def eval(self, text: str | None):  # noqa: D102
        if not text:
            return
        sentences: list[str] = []
        buf: list[str] = []
        i, n = 0, len(text)
        while i < n:
            ch = text[i]
            buf.append(ch)
            if ch in "!?":
                sentences.append("".join(buf))
                buf = []
            elif ch == ".":
                prev_word = "".join(buf).rstrip(".").rsplit(None, 1)
                tail = prev_word[-1].lower().lstrip("(") if prev_word else ""
                in_number = (
                    0 < i < n - 1 and text[i - 1].isdigit() and text[i + 1].isdigit()
                )
                # single letters never end a sentence ('J.' initials,
                # and the first dot of 'e.g.'/'i.e.' — without this the
                # dotted ABBREVIATIONS entries are unreachable, since
                # their first interior dot would break at tail 'e'/'i')
                is_initial = len(tail) == 1 and tail.isalpha()
                if tail not in ABBREVIATIONS and not in_number and not is_initial:
                    sentences.append("".join(buf))
                    buf = []
            i += 1
        if "".join(buf).strip():
            sentences.append("".join(buf))
        for idx, s in enumerate(sentences):
            s = s.strip()
            if s:
                yield idx, s, len(s.split())
