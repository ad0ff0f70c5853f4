"""Grok pattern support: `%{NAME:field}` templates compiled to regex columns.

The north-star contract names "grok/regex parse" as the parse surface; the
reference's operators hand-write regexes per format (its per-format parse
maps, and /root/reference/libs/lib_file_name.py's classifier regexes). This
module gives the user-facing grok layer on top: a dictionary of named
sub-patterns and a compiler that turns a grok template into ONE anchored
regex whose captures become named DataFrame columns via `regexp_extract`
with group indices — plain column expressions, whole-stage-codegen'd, no
Python in the row path.

Dialect note: every pattern below stays inside the regex subset that Java
(Spark) and RE2 (DuckDB) interpret identically — character classes,
quantifiers, alternation; no lookaround, no backreferences — so a grok
extraction is DuckDB-oracle-checkable. The stronger check used by the
driver query: extracted fields are compared against the corpus GROUND
TRUTH fields (no regex on the oracle side at all), so a wrong pattern
cannot "agree" with itself.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the core grok vocabulary (subset sufficient for access-log work; extend
# freely — compile() is generic)
GROK_PATTERNS: dict[str, str] = {
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "WORD": r"\w+",
    "NUMBER": r"\d+",
    "INT": r"[+-]?\d+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"[^\"]*",
    "HTTPDATE": r"[^\]]+",
    "URIPATH": r"[^\s?\"]+",
    "USER": r"[\w.-]+",
}

_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(template: str) -> tuple[str, list[str]]:
    """Grok template -> (regex with one capture group per named token,
    field names in group order). Unnamed tokens match without capturing.
    Literal text between tokens is regex-escaped."""
    fields: list[str] = []
    out: list[str] = []
    pos = 0
    for m in _TOKEN.finditer(template):
        out.append(re.escape(template[pos : m.start()]))
        name, field = m.group(1), m.group(2)
        if name not in GROK_PATTERNS:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        sub = GROK_PATTERNS[name]
        if field:
            fields.append(field)
            out.append(f"({sub})")
        else:
            out.append(f"(?:{sub})")
        pos = m.end()
    out.append(re.escape(template[pos:]))
    return "".join(out), fields


def grok_extract(
    df: DataFrame, template: str, line_col: str = "line", anchored: bool = True
) -> DataFrame:
    """Append one column per named grok field (empty string on no-match,
    regexp_extract semantics). One compiled regex evaluated per group —
    Catalyst CSEs the shared match machinery; all JVM-side."""
    regex, fields = compile_grok(template)
    if anchored:
        regex = f"^{regex}$"
    cols: list[Column] = [
        F.regexp_extract(F.col(line_col), regex, i + 1).alias(f)
        for i, f in enumerate(fields)
    ]
    return df.select("*", *cols)


# the NCSA combined template in grok form (reference parse target); literal
# text (brackets, quotes) is escaped by the compiler, not pre-escaped here
NCSA_COMBINED_TEMPLATE = (
    '%{IP:ip} %{NOTSPACE} %{NOTSPACE} [%{HTTPDATE:ts}] '
    '"%{WORD:method} %{NOTSPACE:path} %{NOTSPACE}" '
    '%{NUMBER:status} %{NOTSPACE:nbytes} '
    '"%{DATA:referrer}" "%{QUOTEDSTRING:ua}"'
)


# W3C extended (space-separated: date time c-ip cs-method cs-uri-stem
# cs-uri-query sc-status sc-bytes cs(User-Agent) cs(Referer)). The anchored
# 10-field shape rejects every other corpus format: IIS has 12 fields, NCSA
# starts with an IP, cloudfront is tab-separated (literal ' ' does not match
# a tab), nginx_json has no third-field IP.
W3C_EXTENDED_TEMPLATE = (
    "%{NOTSPACE:date} %{NOTSPACE:time} %{IP:ip} %{WORD:method} "
    "%{URIPATH:stem} %{NOTSPACE:query} %{NUMBER:status} %{NOTSPACE:nbytes} "
    "%{NOTSPACE:ua} %{NOTSPACE:referrer}"
)
