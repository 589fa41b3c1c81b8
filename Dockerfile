# Container packaging parity with the reference's Lambda image
# (reference Dockerfile:1-7), re-shaped for a Spark engine: the image
# is a spark-submit-able driver/executor payload. Base it on the
# official Apache Spark image so the JVM, Spark jars, and entrypoint
# scripts come from upstream; we add only the Python package and its
# (stdlib-plus-pyspark-only) runtime deps.
#
# Build:  docker build -t cost-of-living-etl-spark .
# Run the event-shaped handler (reference app.py:106,202-205 parity):
#   docker run cost-of-living-etl-spark \
#     driver local:///opt/app/handler.py '{"extractDate": "2024-01-01"}'
# Or submit to a cluster by overriding --master / deploy-mode as usual.
# Pinned to the SAME Spark release CI tests with (pyspark==4.1.2 in
# .github/workflows/main.yml) so the pushed artifact runs the exact
# Spark version the suite exercised.
FROM apache/spark:4.1.2-python3

WORKDIR /opt/app
USER root
COPY cost_of_living_data_etl_spark /opt/app/cost_of_living_data_etl_spark
COPY tools/gen_testdata.py /opt/app/tools/gen_testdata.py
COPY bench.py __spark_entry__.py /opt/app/

# handler.py: spark-submit entry that adapts argv -> main(event)
RUN printf '%s\n' \
    'import json, sys' \
    'sys.path.insert(0, "/opt/app")' \
    'from cost_of_living_data_etl_spark.app import main' \
    'main(json.loads(sys.argv[1]) if len(sys.argv) > 1 else {})' \
    > /opt/app/handler.py

ENV PYTHONPATH=/opt/app
USER spark
ENTRYPOINT ["/opt/entrypoint.sh"]
