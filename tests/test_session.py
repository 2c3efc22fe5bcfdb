"""Session factory: the opt-in S3A object-store hook.

The sandbox has no object store, so these tests assert the *conf dict*
the hook would hand the builder (the reference wires the same keys at
docker-images/validation/validate.py:58-63) — and, critically, that the
hook stays dormant for local/test sessions.
"""

from pyspark.sql import SparkSession

from real_time_event_driven_data_pipeline_spark.session import object_store_confs


def test_dormant_without_opt_in():
    assert object_store_confs({}) == {}
    assert object_store_confs({"RTEDP_S3A_ENDPOINT": "http://x"}) == {}


def test_base_s3a_confs():
    confs = object_store_confs({"RTEDP_S3A": "1"})
    assert confs["spark.hadoop.fs.s3a.impl"] == "org.apache.hadoop.fs.s3a.S3AFileSystem"
    assert (
        confs["spark.hadoop.fs.s3a.aws.credentials.provider"]
        == "com.amazonaws.auth.DefaultAWSCredentialsProviderChain"
    )
    assert "spark.hadoop.fs.s3a.endpoint" not in confs
    assert "spark.jars" not in confs


def test_all_knobs_land_in_builder():
    env = {
        "RTEDP_S3A": "1",
        "RTEDP_S3A_CREDENTIALS_PROVIDER": "org.example.MyProvider",
        "RTEDP_S3A_ENDPOINT": "http://minio.local:9000",
        "RTEDP_S3A_PATH_STYLE": "1",
        "RTEDP_S3A_JARS": "/jars/hadoop-aws-3.3.4.jar,/jars/aws-sdk.jar",
    }
    confs = object_store_confs(env)
    assert confs["spark.hadoop.fs.s3a.aws.credentials.provider"] == "org.example.MyProvider"
    assert confs["spark.hadoop.fs.s3a.endpoint"] == "http://minio.local:9000"
    assert confs["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert confs["spark.jars"] == "/jars/hadoop-aws-3.3.4.jar,/jars/aws-sdk.jar"

    # and they land on a real builder (no session started)
    builder = SparkSession.builder
    for k, v in confs.items():
        builder = builder.config(k, v)
    opts = builder._options
    for k, v in confs.items():
        assert opts[k] == v
