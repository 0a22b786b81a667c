"""Differential fuzz for the sketch/sampling kernels: arbitrary unicode
keys and adversarial float weights must keep the Spark operators and
their Python twins in exact agreement (the same hypothesis-vs-twin
pattern as the parse and grok fuzz suites). Spark sessions are expensive
per example, so each property batches ALL hypothesis examples through
one DataFrame."""

from hypothesis import given, settings, strategies as st

from logagg import aggregate, mix, textfns
from logagg.refsketch import bloom_build_py, bloom_hash_py

# printable-ish unicode incl. astral plane, no surrogates
KEY = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=24
)


@settings(max_examples=8, deadline=None)
@given(st.lists(KEY, min_size=1, max_size=40, unique=True))
def test_bloom_registers_fuzz(spark, keys):
    m, k = 1 << 10, 3
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    got = {
        (r["word"], r["bits"])
        for r in aggregate.bloom_build(df, "key", n_bits=m, n_hashes=k).collect()
    }
    assert got == set(bloom_build_py(keys, m, k).items())
    # no false negatives for ANY unicode key
    regs = aggregate.bloom_collect(
        aggregate.bloom_build(df, "key", n_bits=m, n_hashes=k), n_bits=m
    )
    hit = aggregate.bloom_probe(df, "key", regs, n_bits=m, n_hashes=k)
    assert hit.filter("NOT bloom_hit").count() == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.one_of(
                st.none(),
                st.just(float("nan")),
                st.just(float("inf")),
                st.floats(min_value=-10.0, max_value=1e6),
            ),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=20),
)
def test_weighted_sample_fuzz(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = sorted(
        r["doc_id"]
        for r in mix.weighted_sample(df, "w", k, id_col="doc_id", seed="fz").collect()
    )
    want = sorted(textfns.weighted_sample_py(rows, k, seed="fz"))
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
       st.integers(min_value=0, max_value=6))
def test_bloom_hash_stability_fuzz(key, j):
    # pure-twin invariants: in range, deterministic, j-sensitivity
    m = 1 << 12
    h = bloom_hash_py(j, key, m)
    assert 0 <= h < m
    assert h == bloom_hash_py(j, key, m)
