"""Multimodal pipeline plumbing: schemas, determinism, batch shapes."""

from __future__ import annotations

import pyspark.sql.functions as F

from cost_of_living_data_etl_spark.operators.multimodal import (

    ASSET_SCHEMA,
    N_FEATURES,
    documents_to_assets,
    extract_features,
    read_binary_assets,
    sample_frames,
)
from conftest import TESTDATA

SF = f"{TESTDATA}/sf0.001"


def test_asset_schema_and_payload(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assets = documents_to_assets(docs)
    # simpleString ignores nullability flags, which differ between
    # derived and declared schemas and don't affect the contract
    assert assets.schema.simpleString() == ASSET_SCHEMA.simpleString()
    row = assets.filter(F.col("asset_id") == 1).collect()[0]
    doc = docs.filter(F.col("doc_id") == 1).collect()[0]
    assert bytes(row["payload"]).decode("utf-8") == doc["text"]
    # byte length of the utf-8 payload, NOT character count — these
    # differ on non-ASCII text and the metadata must track the payload
    assert row["meta"]["n_bytes"] == len(doc["text"].encode("utf-8"))
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))
    assert row["kind"] in ("image", "audio", "video")


def test_binaryfile_source_to_assets(spark, tmp_path):
    """Real ingestion path: files on disk → binaryFile source → asset
    schema → feature extraction, bytes round-tripping exactly."""
    payloads = {7: b"\x00\x01\x02hello", 42: bytes(range(200))}
    for aid, data in payloads.items():
        (tmp_path / f"{aid}.bin").write_bytes(data)

    assets = read_binary_assets(spark, str(tmp_path), "image")
    assert assets.schema.simpleString() == ASSET_SCHEMA.simpleString()
    rows = {r["asset_id"]: r for r in assets.collect()}
    assert set(rows) == {7, 42}
    assert bytes(rows[42]["payload"]) == payloads[42]
    assert rows[7]["meta"]["n_bytes"] == len(payloads[7])
    assert rows[7]["meta"]["width"] is None  # unknown until decode

    feats = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert feats[42]["n_samples"] == 200
    assert len(feats[42]["features"]) == N_FEATURES


def test_feature_extraction_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    feats1 = extract_features(documents_to_assets(docs)).collect()
    feats2 = extract_features(documents_to_assets(docs)).collect()
    m1 = {r["asset_id"]: r["features"] for r in feats1}
    m2 = {r["asset_id"]: r["features"] for r in feats2}
    assert m1 == m2
    for r in feats1:
        assert len(r["features"]) == N_FEATURES
        assert abs(sum(r["features"]) - 1.0) < 1e-5  # normalized histogram
        assert r["n_samples"] > 0


def test_frame_sampling_rowcounts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assets = documents_to_assets(docs)
    frames = sample_frames(assets, frame_bytes=64, every=4)
    n_video = assets.filter(F.col("kind") == "video").count()
    assert n_video > 0
    got = frames.groupBy("asset_id").count().collect()
    assert len(got) == n_video
    # every frame is at most frame_bytes long and indexed from 0
    check = frames.agg(
        F.max(F.length("frame")).alias("mx"), F.min("frame_idx").alias("mn")
    ).collect()[0]
    assert check["mx"] <= 64 and check["mn"] == 0


def test_custom_decoder_injection(spark):
    """The decode seam (round-8 verdict item 5): a user-supplied
    decoder callable replaces the deterministic stub without touching
    the mapInPandas plumbing — same schema, same batch shape, decoder
    semantics fully owned by the caller. The fake 'codec' here returns
    a constant-length ramp whose histogram differs measurably from the
    byte-histogram stub, proving the custom path actually ran."""
    import numpy as np

    def ramp_decoder(payload: bytes, kind: str) -> np.ndarray:
        # pretend every asset decodes to 32 samples 0..31 (bin 0,1 only)
        return np.arange(32, dtype=np.uint8)

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    assets = documents_to_assets(docs)
    custom = extract_features(assets, decoder=ramp_decoder).collect()
    assert custom, "custom decode produced rows"
    for r in custom:
        assert r["n_samples"] == 32
        feats = r["features"]
        assert len(feats) == N_FEATURES
        # 32 ramp samples in [0,32) all land in the first two 16-wide bins
        assert abs(feats[0] - 0.5) < 1e-6 and abs(feats[1] - 0.5) < 1e-6
        assert all(abs(v) < 1e-9 for v in feats[2:])
    # default path (stub) still differs — the injection is not a no-op
    stub = extract_features(assets).collect()
    stub_m = {r["asset_id"]: r["n_samples"] for r in stub}
    assert any(v != 32 for v in stub_m.values())
