"""The offline quantizer artifact workflow (round-5 verdict item 6).

The ANN guards name a runnable command (`python -m
cost_of_living_data_etl_spark.jobs.fit_quantizer`); these tests prove
the workflow it describes is real: the artifact fit is bit-identical
to the in-session fit, priming the cache from the artifact makes the
IVF consumers produce identical results without refitting, and a
non-default k actually changes the fit (the k ∝ N contract is a real
parameter, not a docstring).
"""

from __future__ import annotations

from cost_of_living_data_etl_spark.operators.similarity import (
    IVF_K,
    _fit_ivf_centroids,
    _IVF_CENT_CACHE,
    clear_quantizer_caches,
    corpus_cache_key,
    fit_quantizer,
    load_quantizer,
    use_quantizer_artifact,
    with_norm,
)
from cost_of_living_data_etl_spark.sources.tables import load_table

from conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def test_artifact_fit_is_bit_identical_to_in_session_fit(spark, tmp_path):
    out = str(tmp_path / "quantizer")
    fit_quantizer(spark, SF, out)
    artifact = load_quantizer(spark, out)
    in_session = sorted(
        _fit_ivf_centroids(with_norm(load_table(spark, SF, "embeddings")))
    )
    assert artifact == in_session  # exact float equality: same fit, no RNG
    assert len(artifact) == IVF_K


def test_consumers_accept_artifact_and_skip_refit(spark, tmp_path):
    from cost_of_living_data_etl_spark.operators.similarity import (
        q_ann_ivf_probe,
    )

    out = str(tmp_path / "quantizer")
    fit_quantizer(spark, SF, out)

    clear_quantizer_caches()
    baseline = sorted(map(tuple, q_ann_ivf_probe(spark, SF).collect()))

    clear_quantizer_caches()
    use_quantizer_artifact(spark, SF, out)
    # the cache is primed — the query must NOT refit (the artifact
    # object stays the exact list use_quantizer_artifact installed)
    primed = _IVF_CENT_CACHE[corpus_cache_key(SF)]
    got = sorted(map(tuple, q_ann_ivf_probe(spark, SF).collect()))
    assert _IVF_CENT_CACHE[corpus_cache_key(SF)] is primed
    assert got == baseline
    clear_quantizer_caches()


def test_k_is_a_real_parameter(spark, tmp_path):
    out = str(tmp_path / "quantizer_k4")
    fit_quantizer(spark, SF, out, k=4, iters=2)
    artifact = load_quantizer(spark, out)
    assert len(artifact) == 4


def test_cli_main_writes_artifact(spark, tmp_path, capsys):
    """The exact command the guard messages print must run and write
    the artifact (driven with the shared session so the fixture
    survives)."""
    from cost_of_living_data_etl_spark.jobs.fit_quantizer import main

    out = str(tmp_path / "quantizer_cli")
    got = main(
        ["--sf-dir", SF, "--out", out, "--k", "2", "--iters", "1"],
        spark=spark,
    )
    assert got == out
    assert "wrote 2 centroids" in capsys.readouterr().out
    assert len(load_quantizer(spark, out)) == 2
