"""Cache hygiene: query-owned caches must be releasable and queries must
not leave pinned storage behind once the harness releases them (VERDICT r4
"What's wrong" #1 / ADVICE r4 similarity.py:501 — a long-lived 100 TB
session running the full sweep must not accumulate cached plans)."""

from map_reduce_go_spark.functions.caching import release_caches, storage_is_empty
from map_reduce_go_spark.registry import all_queries

SMOKE_SF = "/root/testdata/sf0.001"

# The cache-heaviest query families: two-pass text stats, the bigram LM,
# the IVF-sharing pair, and LSH shingle reuse.
CACHE_HEAVY = (
    "tfidf_top_terms",
    "bigram_lm_doc_score",
    "pmi_collocations",
    "semdedup_prune",
    "ann_ivf_cosine",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_stopfiltered",
)


def test_cache_heavy_queries_release_clean(spark):
    specs = all_queries()
    release_caches()  # start from a clean slate regardless of test order
    assert storage_is_empty(spark)
    for name in CACHE_HEAVY:
        specs[name].fn(spark, SMOKE_SF).count()
        release_caches()
        assert storage_is_empty(spark), (
            f"{name} left cached plans behind after release_caches()"
        )


def test_release_is_idempotent_and_correctness_neutral(spark):
    specs = all_queries()
    df = specs["tfidf_top_terms"].fn(spark, SMOKE_SF)
    n1 = df.count()
    release_caches()
    release_caches()  # double release must be a no-op
    # The returned plan stays valid after its cache is dropped — it simply
    # recomputes from source.
    assert df.count() == n1
