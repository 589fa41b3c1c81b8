"""CLI for the offline quantizer fit the ANN guards point to.

    python -m cost_of_living_data_etl_spark.jobs.fit_quantizer \
        --sf-dir /root/testdata/sf0.1 --k 8 --out /tmp/quantizer

Fits the deterministic Lloyd coarse quantizer over
``{sf_dir}/embeddings.parquet`` with k sized to the corpus (the k ∝ N
contract: SemDeDup used k = 50k at LAION scale) and publishes the
centroids as a parquet artifact. Consumers prime their session with
``operators.similarity.use_quantizer_artifact(spark, sf_dir, out)``.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None, spark=None) -> str:
    """Parse args, fit, publish; returns the artifact path. Creates
    (and stops) its own SparkSession only when none is passed in, so
    tests can drive it with a shared session."""
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sf-dir", required=True, help="corpus dir with embeddings.parquet")
    p.add_argument("--out", required=True, help="output parquet path for centroids")
    p.add_argument("--k", type=int, default=None, help="cells (default: IVF_K)")
    p.add_argument("--iters", type=int, default=None, help="Lloyd rounds (default: IVF_ITERS)")
    p.add_argument("--table", default="embeddings")
    args = p.parse_args(argv)

    from cost_of_living_data_etl_spark.operators.similarity import (
        IVF_ITERS,
        IVF_K,
        fit_quantizer,
    )

    owns_session = spark is None
    if owns_session:
        from cost_of_living_data_etl_spark.session import get_spark

        spark = get_spark(app_name="fit-quantizer")
    try:
        out = fit_quantizer(
            spark,
            args.sf_dir,
            args.out,
            k=args.k if args.k is not None else IVF_K,
            iters=args.iters if args.iters is not None else IVF_ITERS,
            table=args.table,
        )
        n = spark.read.parquet(out).count()
        print(f"wrote {n} centroids to {out}")
        return out
    finally:
        if owns_session:
            spark.stop()


if __name__ == "__main__":
    main()
