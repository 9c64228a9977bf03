"""Shared DuckDB-oracle SQL expression builders.

Keeps cross-engine expression idioms in ONE place for new operator
modules.  (dedup.py:785 and curation_ext.py:422 carry older inline
copies of hex2int predating this module; they are oracle-frozen with
their LOCALGATES credits and deliberately not rewritten — editing
those modules would flag every query they define as changed.)
"""

from __future__ import annotations


def duck_hex2int(var: str) -> str:
    """SQL decoding the first 8 hex chars bound to ``var`` into the
    same BIGINT Spark's ``conv(substring(md5(x),1,8),16,10)`` yields."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({var}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
