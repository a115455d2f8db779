"""Reproducible sampling, JSON extraction, and fuzzy-match dedup, oracle-checked.

Three operations every large-scale training-data pipeline needs that the
reference (pure T-SQL warehouse) never touches:

- **Deterministic hash sampling**: a 1-in-N sample that is stable across
  runs, engines, and cluster sizes because membership is a pure function of
  the row key (md5 nibble), not an RNG. `df.sample()` draws per-partition
  random numbers — resplitting the input changes the sample; hash sampling
  never does, which is what you want for reproducible eval holdouts at
  100 TB. Runs entirely in the scan stage (no shuffle, filter pushes to
  the parquet reader's row-group level via the doc_id column).

- **JSON property extraction**: semi-structured `props` columns are the
  norm in event lakes. `get_json_object` is a JVM-side path evaluation —
  no Python, no schema inference pass; at scale prefer `from_json` with an
  explicit schema so Catalyst prunes unused fields.

- **Blocked fuzzy dedup**: pairwise edit distance is O(n²) and undoable at
  scale; blocking (equi-join on a cheap key: language + text prefix) cuts
  candidates to within-block pairs, then exact Levenshtein runs only on
  candidates. Same shape as the MinHash-LSH pipeline (dedup.py) with a
  cheaper, deterministic blocking key — the classic record-linkage
  blocking+compare pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import tpch


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tpch.load(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Deterministic hash sampling: keep rows whose md5(doc_id) last nibble is 0
# (a 1/16 expected-rate sample, exact same membership in any engine).
# ---------------------------------------------------------------------------

_HASH_SAMPLE_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 = 0
ORDER BY doc_id
"""


def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1/16 reproducible sample keyed on md5(doc_id)'s last nibble.
    Membership is a pure row function: stable under repartitioning,
    identical across engines (md5 is md5 everywhere), and extendable to
    any rate via more nibbles. Pure narrow filter — no shuffle."""
    docs = _t(spark, sf_dir, "documents")
    nibble = F.expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 32, 1)) - 1")
    return (
        docs.filter(nibble == 0)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# JSON extraction: pull props.k out of the event payload, profile per type.
# ---------------------------------------------------------------------------

_JSON_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(AVG(CAST(json_extract(props, '$.k') AS INT)) AS DOUBLE) AS avg_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("events_json_extract", oracle=_JSON_SQL, defer=True)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the integer `k` property from the JSON `props` column and
    profile it per event type. `get_json_object` evaluates the path in the
    JVM; with many extracted fields switch to one `from_json` with an
    explicit struct schema (single parse, Catalyst prunes the rest)."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.avg("k").alias("avg_k"),
            F.max("k").cast("int").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Blocked fuzzy dedup: block on (lang, 16-char prefix), compare candidates
# with Levenshtein over a 64-char prefix.
# ---------------------------------------------------------------------------

_FUZZY_SQL = """
WITH d AS (SELECT doc_id, lang, text FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64)) AS INT)
           AS edit_distance
FROM d a
JOIN d b
  ON a.lang = b.lang
 AND substr(a.text, 1, 16) = substr(b.text, 1, 16)
 AND a.doc_id < b.doc_id
WHERE levenshtein(substr(a.text, 1, 64), substr(b.text, 1, 64)) <= 12
ORDER BY doc_a, doc_b
"""


@query("dedup_fuzzy_blocked", oracle=_FUZZY_SQL, defer=True)
def dedup_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking + edit-distance compare: equi-join on
    (lang, 16-char prefix) confines the O(n²) Levenshtein to within-block
    candidate pairs — one shuffle on the blocking key, linear in candidates.
    Prefix-bounded Levenshtein (64 chars) caps per-pair cost; `doc_id <
    doc_id` halves the pair space. Blocking recall trades against LSH
    (dedup.py): prefix blocks miss edits inside the first 16 chars, MinHash
    does not — production pipelines union both candidate sets."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    a = docs.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.substring("text", 1, 16).alias("block"),
        F.substring("text", 1, 64).alias("prefix_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        F.substring("text", 1, 16).alias("block"),
        F.substring("text", 1, 64).alias("prefix_b"),
    )
    return (
        a.join(b, ["lang", "block"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("prefix_a", "prefix_b").cast("int").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 12)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Deterministic train/test split: md5 nibble buckets 0-12 train, 13-15 test.
# ---------------------------------------------------------------------------

_SPLIT_SQL = """
SELECT CASE WHEN strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)) - 1 < 13
            THEN 'train' ELSE 'test' END AS split,
       lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1, 2
ORDER BY split, lang
"""


def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~81/19 train/test split assigned by md5(doc_id) nibble — the
    reproducible-holdout pattern: a document's split never changes when
    data is added, repartitioned, or the job reruns (per-row pure function;
    `randomSplit` guarantees none of that). Profiled per language to show
    strata stay balanced."""
    docs = _t(spark, sf_dir, "documents")
    nibble = F.expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 32, 1)) - 1")
    return (
        docs.select(
            F.when(nibble < 13, "train").otherwise("test").alias("split"),
            "lang",
            "n_chars",
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )

# ---------------------------------------------------------------------------
# Composite registration: both hash-assignment operators in one driver row.
# ---------------------------------------------------------------------------

_HASH_SPLIT_SQL = f"""
SELECT 'hash_sample' AS leg, doc_id, lang, source, n_chars,
       CAST(NULL AS VARCHAR) AS split, CAST(NULL AS BIGINT) AS n_docs,
       CAST(NULL AS BIGINT) AS total_chars
FROM ({_HASH_SAMPLE_SQL})
UNION ALL
SELECT 'train_test_split', CAST(NULL AS BIGINT), lang, CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), split, n_docs, total_chars
FROM ({_SPLIT_SQL})
ORDER BY leg, doc_id, lang, split
"""


@query("sample_hash_split", oracle=_HASH_SPLIT_SQL, defer=True)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1/16 hash sample + reproducible train/test split,
    union-tagged — both membership functions are pure md5(doc_id) nibble
    predicates, stable under repartitioning and engine choice."""
    _ns = F.lit(None).cast("string")
    _nl = F.lit(None).cast("bigint")
    sample = sample_deterministic_hash(spark, sf_dir).select(
        F.lit("hash_sample").alias("leg"),
        "doc_id",
        "lang",
        "source",
        "n_chars",
        _ns.alias("split"),
        _nl.alias("n_docs"),
        _nl.alias("total_chars"),
    )
    split = sample_train_test_split(spark, sf_dir).select(
        F.lit("train_test_split").alias("leg"),
        _nl.alias("doc_id"),
        "lang",
        _ns.alias("source"),
        _nl.alias("n_chars"),
        "split",
        "n_docs",
        "total_chars",
    )
    return sample.unionByName(split).orderBy("leg", "doc_id", "lang", "split")
