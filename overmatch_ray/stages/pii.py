"""PII detection / redaction — a standard compliance pass of a
training-data pipeline (scrub emails, phone numbers, IP addresses before
a corpus ships to training).

Fully vectorized: counts via ``pc.count_substring_regex`` and rewrites via
``pc.replace_substring_regex`` — both RE2 kernels running zero-copy over
the Arrow string column, no per-row Python. DuckDB's regex engine is also
RE2, so the DuckDB oracle (``regexp_replace(..., 'g')`` /
``len(regexp_extract_all(...))``) uses the IDENTICAL pattern strings —
bit-exact parity by construction.

Redaction order matters and is pinned: emails → IPv4 → phones. The phone
pattern requires a leading ``+`` so it can never re-match the digits of an
already-redacted dotted quad, and IPv4 runs after email so a host part
like ``user@192.168.0.1`` is consumed by the email rule first.

At 100 TB this is a pure map stage: streams, fuses with neighbors, no
shuffle, no state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-compatible patterns, shared verbatim with the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{4}\b"

# (name, pattern, replacement) in pinned application order
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ips", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
)


def redact_pii_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "clean_text"
) -> pa.Table:
    """Append ``out_col`` (text with every PII span replaced by its
    placeholder) and one ``n_<rule>`` int64 count column per rule. Counts
    are taken against the text as each rule sees it (i.e. after the
    previous rules' replacements), matching sequential ``regexp_replace``
    semantics in the oracle."""
    cur = batch[text_col]
    if isinstance(cur, pa.ChunkedArray):
        cur = cur.combine_chunks()
    counts = {}
    for name, pattern, repl in PII_RULES:
        counts[name] = pc.count_substring_regex(cur, pattern=pattern)
        cur = pc.replace_substring_regex(
            cur, pattern=pattern, replacement=repl
        )
    out = batch.append_column(out_col, cur)
    for name, _, _ in PII_RULES:
        out = out.append_column(
            f"n_{name}", counts[name].cast(pa.int64())
        )
    return out


def redact_pii(ds, text_col: str = "text", out_col: str = "clean_text"):
    """Dataset wrapper: one fused vectorized map stage."""
    return ds.map_batches(
        redact_pii_batch,
        fn_kwargs={"text_col": text_col, "out_col": out_col},
        batch_format="pyarrow",
    )
