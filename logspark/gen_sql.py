"""Deterministic synthetic tokenized-log corpus — portable SQL generator.

The SAME SQL text executes in Spark SQL and in DuckDB (the driver's oracle),
so goldens are equal by construction. Everything is a pure function of an
integer ``d`` (the sequence id) — seed-stable, partition-independent, no RNG,
no wall clock — as required by FIXTURES.md §1 and the reference's
reproducibility invariants (conservation law, /root/reference/libs/
lib_summary.py:60-65; deterministic classification, libs/lib_file_name.py:120-136).

Formats generated (BASELINE.json north_star): ncsa_common, ncsa_combined,
w3c_extended, iis, nginx_json, cloudfront — with the skewed ``source``
distribution of FIXTURES.md §1 (60% one hot source) to exercise salting/AQE.

Portable-SQL dialect subset (verified in both engines this session):
``||  CASE  %  CAST(AS STRING/INT/BIGINT)  lpad substr replace lower chr
nullif coalesce  LIKE  md5 instr  range(a,b)  try_cast``.
"""

from __future__ import annotations

TAB = "chr(9)"

# ---------------------------------------------------------------------------
# field formulas: pure functions of d (BIGINT >= 0)
# ---------------------------------------------------------------------------

# source/format: d % 20 → 60% apache-hiperion (skew; reference server taxonomy
# /root/reference/libs/values.py:4-52 has the same hot-server shape).
_FMT_CASE = """CASE
  WHEN d % 20 < 12 THEN 'ncsa_combined'
  WHEN d % 20 < 14 THEN 'ncsa_common'
  WHEN d % 20 < 16 THEN 'nginx_json'
  WHEN d % 20 < 18 THEN 'cloudfront'
  WHEN d % 20 < 19 THEN 'iis'
  ELSE 'w3c_extended' END"""

_SOURCE_CASE = """CASE
  WHEN d % 20 < 12 THEN 'apache-hiperion'
  WHEN d % 20 < 14 THEN 'varnish02'
  WHEN d % 20 < 16 THEN 'nginx-json01'
  WHEN d % 20 < 18 THEN 'cloudfront-dist1'
  WHEN d % 20 < 19 THEN 'iis01'
  WHEN d % 40 = 19 THEN 'ven1'
  ELSE 'w3c-node03' END"""

# One row per d; FIELDS_SQL yields every ground-truth field the oracle needs.
# {rel} must provide a single column d:bigint.
FIELDS_SQL = """
SELECT
  d,
  'doc-' || lpad(CAST(d AS STRING), 12, '0')                    AS doc_id,
  {fmt_case}                                                    AS fmt,
  {source_case}                                                 AS source,
  '10.' || CAST(d % 223 AS STRING) || '.' || CAST((d * 7) % 251 AS STRING)
        || '.' || CAST((d * 13) % 241 AS STRING)                AS ip,
  lpad(CAST(d % 28 + 1 AS STRING), 2, '0')                      AS dd,
  lpad(CAST(d % 24 AS STRING), 2, '0')                          AS hh,
  lpad(CAST((d * 3) % 60 AS STRING), 2, '0')                    AS mi,
  lpad(CAST((d * 7) % 60 AS STRING), 2, '0')                    AS ss,
  CASE WHEN d % 11 < 8 THEN 'GET'
       WHEN d % 11 < 10 THEN 'POST' ELSE 'HEAD' END             AS method,
  CASE
    WHEN d % 23 = 0 THEN '/assets/app-' || CAST(d % 997 AS STRING) || '.css'
    WHEN d % 23 = 1 THEN '/static/lib-' || CAST(d % 997 AS STRING) || '.js'
    WHEN d % 23 = 2 THEN '/img/banner-' || CAST(d % 997 AS STRING) || '.png'
    WHEN d % 23 = 3 THEN '/files/report-' || CAST(d % 997 AS STRING) || '.pdf'
    WHEN d % 23 = 4 THEN '/files/archive-' || CAST(d % 997 AS STRING) || '.zip'
    WHEN d % 23 = 5 THEN '/redirect'
    WHEN d % 23 = 6 THEN '/admin/panel-' || CAST(d % 97 AS STRING)
    ELSE '/article/' || CAST(d % 5000 AS STRING) END            AS stem,
  CASE
    WHEN d % 23 = 5 THEN 'to=http://external-' || CAST(d % 40 AS STRING) || '.example.com'
    WHEN d % 23 >= 7 AND d % 3 = 0 THEN 'q=spark'
    WHEN d % 23 >= 7 AND d % 3 = 1 AND d % 7 = 0 THEN
      'utm_campaign=spring-' || CAST(d % 5 AS STRING)
        || '&utm_source=newsletter&utm_medium=email'
    WHEN d % 23 >= 7 AND d % 3 = 1 AND d % 7 = 1 THEN
      'pk_campaign=retarget-' || CAST(d % 4 AS STRING)
        || '&pk_source=adnet-' || CAST(d % 2 AS STRING)
        || '&utm_campaign=shadowed'
    WHEN d % 23 >= 7 AND d % 3 = 1 AND d % 7 = 2 THEN
      'mtm_campaign=launch&mtm_source=social&mtm_medium=cpc&q=spark'
    ELSE '' END                                                 AS query,
  CASE WHEN d % 31 = 0 THEN 404
       WHEN d % 31 = 1 THEN 500
       WHEN d % 31 = 2 THEN 503
       WHEN d % 31 = 3 THEN 301
       WHEN d % 31 = 4 THEN 302 ELSE 200 END                    AS status,
  (d * 37) % 100000                                             AS nbytes,
  d % 13 = 0                                                    AS bytes_missing,
  CASE WHEN d % 5 = 0 THEN '-'
       ELSE 'http://ref-' || CAST(d % 50 AS STRING) || '.example.com/' END AS referrer,
  CASE WHEN d % 19 = 0 THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'
       WHEN d % 19 = 1 THEN 'curl/8.0 spider-probe'
       ELSE 'Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36' END AS ua,
  d % 101 = 0                                                   AS corrupt
FROM {rel}
""".replace("{fmt_case}", _FMT_CASE).replace("{source_case}", _SOURCE_CASE)

# derived pieces reused by line templates and the oracle
_DERIVED_SQL = """
SELECT *,
  stem || CASE WHEN query = '' THEN '' ELSE '?' || query END    AS path,
  dd || '/Mar/2024:' || hh || ':' || mi || ':' || ss            AS ncsa_time,
  '2024-03-' || dd                                              AS iso_date,
  hh || ':' || mi || ':' || ss                                  AS iso_time,
  CASE WHEN bytes_missing THEN '-' ELSE CAST(nbytes AS STRING) END AS bytes_s,
  replace(ua, ' ', '+')                                         AS ua_plus
FROM ({fields}) fields_
"""

# line templates per format (the contract our parse stage implements —
# see logspark/formats.py for the exact field orders)
_LINE_SQL = """
SELECT *,
  CASE
    WHEN corrupt THEN '!!corrupt record ' || CAST(d AS STRING) || ' ##'
    WHEN fmt = 'ncsa_combined' THEN
      ip || ' - - [' || ncsa_time || ' +0000] "' || method || ' ' || path
         || ' HTTP/1.1" ' || CAST(status AS STRING) || ' ' || bytes_s
         || ' "' || referrer || '" "' || ua || '"'
    WHEN fmt = 'ncsa_common' THEN
      ip || ' - - [' || ncsa_time || ' +0000] "' || method || ' ' || path
         || ' HTTP/1.1" ' || CAST(status AS STRING) || ' ' || bytes_s
    WHEN fmt = 'nginx_json' THEN
      '{"remote_addr":"' || ip || '","time_local":"' || ncsa_time
         || ' +0000","request":"' || method || ' ' || path
         || ' HTTP/1.1","status":' || CAST(status AS STRING)
         || ',"body_bytes_sent":' || CAST(nbytes AS STRING)
         || ',"http_referer":"' || referrer
         || '","http_user_agent":"' || ua || '"}'
    WHEN fmt = 'cloudfront' THEN
      iso_date || {t} || iso_time || {t} || 'LAX50-C1' || {t} || bytes_s
         || {t} || ip || {t} || method || {t} || 'd111.cf.net' || {t} || stem
         || {t} || CAST(status AS STRING) || {t} || referrer || {t} || ua_plus
         || {t} || CASE WHEN query = '' THEN '-' ELSE query END
    WHEN fmt = 'iis' THEN
      iso_date || ' ' || iso_time || ' W3SVC1 10.1.1.1 ' || method || ' '
         || stem || ' ' || CASE WHEN query = '' THEN '-' ELSE query END
         || ' 80 - ' || ip || ' ' || ua_plus || ' ' || CAST(status AS STRING)
    ELSE
      iso_date || ' ' || iso_time || ' ' || ip || ' ' || method || ' ' || stem
         || ' ' || CASE WHEN query = '' THEN '-' ELSE query END || ' '
         || CAST(status AS STRING) || ' ' || bytes_s || ' ' || ua_plus
         || ' ' || replace(referrer, ' ', '+')
  END AS line
FROM ({derived}) derived_
""".replace("{t}", TAB)


def rel_from_documents(table: str = "documents") -> str:
    """Relation providing d from the driver's documents table."""
    return f"(SELECT CAST(doc_id AS BIGINT) AS d FROM {table}) g_"


def rel_from_range(n: int, start: int = 0) -> str:
    """Relation providing d from a virtual range — identical syntax in
    Spark SQL and DuckDB; scales to any corpus size with zero I/O."""
    return f"(SELECT CAST(id AS BIGINT) AS d FROM range({start}, {start + n}) AS t(id)) g_"


def fields_sql(rel: str) -> str:
    return FIELDS_SQL.replace("{rel}", rel)


def corpus_sql(rel: str) -> str:
    """Full generated corpus: one row per d with ground-truth fields + the
    raw log line. Final schema includes (doc_id, source, fmt, line, ...)."""
    derived = _DERIVED_SQL.replace("{fields}", fields_sql(rel))
    return _LINE_SQL.replace("{derived}", derived)


# ---------------------------------------------------------------------------
# oracle route: computed from ground-truth fields (never from parsing),
# mirroring the taxonomy of /root/reference/libs/lib_summary.py:10-20 and
# FIXTURES.md §4. First match wins.
# ---------------------------------------------------------------------------

ROUTE_CASE_SQL = """CASE
  WHEN source IN ('ven1') THEN 'invalid'
  WHEN corrupt THEN 'invalid'
  WHEN status >= 400 THEN 'http_error'
  WHEN status >= 300 THEN 'redirect'
  WHEN fmt <> 'ncsa_common'
       AND (lower(ua) LIKE '%bot%' OR lower(ua) LIKE '%crawler%'
            OR lower(ua) LIKE '%spider%') THEN 'bot'
  WHEN lower(stem) LIKE '%.css' OR lower(stem) LIKE '%.js'
       OR lower(stem) LIKE '%.png' OR lower(stem) LIKE '%.gif'
       OR lower(stem) LIKE '%.ico' OR lower(stem) LIKE '%.svg'
       OR lower(stem) LIKE '%.woff' OR lower(stem) LIKE '%.woff2' THEN 'static'
  WHEN stem LIKE '/admin%' OR (source = 'varnish02' AND dd > '20') THEN 'filtered'
  WHEN lower(stem) LIKE '%.pdf' OR lower(stem) LIKE '%.zip'
       OR lower(stem) LIKE '%.tar.gz' OR lower(stem) LIKE '%.exe' THEN 'download'
  WHEN query LIKE 'to=http%' THEN 'outlink'
  ELSE 'visit' END"""

SINK_CASE_SQL = """CASE route
  WHEN 'invalid' THEN 'errors'
  WHEN 'http_error' THEN 'errors'
  WHEN 'download' THEN 'downloads'
  WHEN 'outlink' THEN 'outlinks'
  WHEN 'visit' THEN 'visits'
  ELSE 'ignored' END"""


def oracle_routed_sql(rel: str, select: str = "doc_id, source, route, sink") -> str:
    """Ground-truth routed corpus (oracle side — no parsing involved)."""
    return f"""
SELECT {select} FROM (
  SELECT *, {SINK_CASE_SQL} AS sink FROM (
    SELECT *, {ROUTE_CASE_SQL} AS route FROM ({corpus_sql(rel)}) corpus_
  ) routed_
) final_"""
