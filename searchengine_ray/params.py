"""Ranking / build constants.

Mirrors the semantics of the reference's tunables (``lib/params.py:9-49`` —
importance multiplier table + the three factor pairs that must each sum to 1)
plus build-pipeline knobs that have no reference counterpart (the reference is
single-process; see SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _assert_sum_is_one(*args: float, msg: str = "") -> None:
    s = sum(args)
    assert 1 - 1e-5 <= s <= 1 + 1e-5, msg


# Score multiplier for important text, indexed by tag id 0..8
# (0 = untagged; 1..8 = title, h1, h2, h3, h4, b, strong, mark).
# Values match lib/params.py:9-19.
IMPORTANCE = [0.8, 3.5, 2.5, 2.1, 1.6, 1.3, 1.1, 1.1, 1.0]

# Important tags in priority order (first match wins), ids 1..8.
# Matches makeindex.py:164-167.
IMPORTANT_TAGS = [
    ("title", 1), ("h1", 2), ("h2", 3), ("h3", 4),
    ("h4", 5), ("b", 6), ("strong", 7), ("mark", 8),
]

# Net score mix (lib/params.py:25-29).
NET_RELEVANCE_FACTOR = 0.61
QUALITY_FACTOR = 1 - NET_RELEVANCE_FACTOR
_assert_sum_is_one(NET_RELEVANCE_FACTOR, QUALITY_FACTOR, msg="net factors")

# Relevance mix (lib/params.py:35-39).
TFIDF_FACTOR = 0.73
COSINE_FACTOR = 1 - TFIDF_FACTOR
_assert_sum_is_one(TFIDF_FACTOR, COSINE_FACTOR, msg="relevance factors")

# Quality mix (lib/params.py:44-49).
PR_FACTOR = 0.59
HUB_FACTOR = 0.23
AUTH_FACTOR = 0.18
_assert_sum_is_one(PR_FACTOR, HUB_FACTOR, AUTH_FACTOR, msg="quality factors")

# Relevance is zeroed unless raw cosine > this gate (lib/queryproc.py:118).
COSINE_GATE = 0.4

# PageRank / HITS (lib/pagerank.py:8, lib/hits.py:15).
PR_DAMPING = 0.85
PR_MAX_ITER = 25
PR_TOL = 1e-6
HITS_MAX_ITER = 25
HITS_TOL = 1e-6

# Near-dup window: compare each doc against the last N accepted simhashes,
# Hamming <= 3 on a 32-bit simhash (makeindex.py:78-79, lib/duphash.py:118,141).
SIMHASH_WINDOW = 200
SIMHASH_BITS = 32
SIMHASH_HAMMING_MAX = 3

# BM25 constants for the additional block-max-WAND top-k mode (no reference
# counterpart — the reference scorer is the tf-idf/cosine/quality mix above).
BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_MAX_SIZE = 128  # postings per block-max block

# Parquet row-group size for the written segments: the query engine seeks
# by per-row-group (min, max) term footer stats (each segment file is
# term-sorted), so a cold term fetch decompresses one row group — this is
# the rebuild's ".seek" granularity (lib/reader.py:88-101).  Small enough
# that a fetch touches ~512 posting rows; large enough that full-segment
# scans (oracle replays, merges) keep their throughput.
SEGMENT_ROW_GROUP_SIZE = 512


@dataclass
class BuildConfig:
    """Knobs for the distributed index build (no reference counterpart)."""

    # extraction/tokenization mode: "reference" = html parse + reference
    # tokenizer + Porter stem; "simple" = the SQL-parity chain (plain-text
    # payload, simple_tokens, no stem) that lets a DuckDB oracle hash-check
    # the identical distributed build end-to-end (stages/extract.py).
    tokenizer: str = "reference"
    # stemmer behavior for the "reference" tokenizer chain: "nltk" (default,
    # matching the reference's NLTK PorterStemmer NLTK_EXTENSIONS mode) or
    # "porter" (the 1980 paper, rule-exact). Recorded in the manifest so the
    # query path stems with the same mode the index was built with.
    stemmer_mode: str = "nltk"
    # near-dup mode: "window" replicates the reference's sequential
    # 200-window semantics (parity w/ oracle); "lsh" is the scale path
    # (simhash Hamming-ball, global not windowed); "off" disables D3;
    # "auto" (default) picks window below stages.dedup.AUTO_WINDOW_THRESHOLD
    # survivors and lsh above it, mirroring linkgraph's
    # AUTO_JOIN_EDGE_THRESHOLD — the flagship default stays parity-correct
    # at fixture scale without becoming a driver-serial scan at 100x.
    near_dup_mode: str = "auto"
    # simhash fingerprint width: 32 (reference parity, required for the
    # "window" D3 mode) or 64 (scale path — at ≳10^9 docs the 32-bit value
    # space saturates and Hamming≤3 stops being selective; 64-bit always
    # runs the fully distributed Hamming-ball prune)
    simhash_bits: int = 32
    # replicate the reference's importance bug (makeindex.py:231-234:
    # the loop assigns `importance` but the posting reads `important`,
    # so emitted importance is always 0). False = intended semantics.
    importance_bug: bool = True
    # keep extracted text in the checkpoint (needed by the byte-identity
    # test; droppable at scale).
    keep_text: bool = True
    # term whose estimated df exceeds this is salted by docid range in the
    # posting-list groupby (skew handling, SURVEY.md §4).
    hot_term_df_threshold: int = 100_000
    # number of docid-range salt buckets for hot terms.
    hot_term_salts: int = 32
    # segments are hash-partitioned into this many term buckets.
    num_term_buckets: int = 16
    # when a join's small side has fewer rows than this, use a broadcast
    # ray.put lookup inside map_batches instead of a hash-shuffle join
    # (SURVEY.md §4 "broadcast small sides"); above it, the join path runs.
    broadcast_threshold: int = 2_000_000
    # batch sizes (html batches: size × bytes/page must fit worker heaps;
    # 256 × ~100KB webtext pages ≈ 25MB/batch)
    extract_batch_size: int = 256
    tokenize_batch_size: int = 256
    # extract execution: None (default) = task pool with per-worker-process
    # cached state (fastest, no actor cold-start); an int or (min, max)
    # tuple = actor pool of that size
    extract_concurrency: int | tuple | None = None
    # output partitioning: docid-range size per output partition (resume unit)
    partition_size: int = 100_000
