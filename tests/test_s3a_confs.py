"""s3a readiness wiring (reference parity: `lambda_function.py:80,288`
reads/writes S3). No object store exists in this container, so these
tests assert the CONF SURFACE — the dict contents and that a running
session's Hadoop configuration actually receives `spark.hadoop.`-
prefixed values — not S3 round-trips."""

import os
from unittest import mock

from aws_etl_pipeline_spark.session import (
    S3A_COMMITTER_CONFS,
    s3a_confs,
    s3a_confs_from_env,
)


def test_default_is_provider_chain_with_committer():
    c = s3a_confs()
    # no credentials pinned -> s3a default provider chain (instance role)
    assert "spark.hadoop.fs.s3a.access.key" not in c
    assert "spark.hadoop.fs.s3a.aws.credentials.provider" not in c
    # cloud committer bound (no O(data) rename phase on job commit)
    for k, v in S3A_COMMITTER_CONFS.items():
        assert c[k] == v


def test_static_and_temporary_credentials_pick_provider():
    static = s3a_confs(access_key="AK", secret_key="SK")
    assert static["spark.hadoop.fs.s3a.access.key"] == "AK"
    assert static["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "SimpleAWSCredentialsProvider"
    )
    temp = s3a_confs(access_key="AK", secret_key="SK", session_token="TOK")
    assert temp["spark.hadoop.fs.s3a.session.token"] == "TOK"
    assert temp["spark.hadoop.fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )


def test_endpoint_region_and_passthrough():
    c = s3a_confs(
        endpoint="http://minio:9000",
        region="us-east-2",
        extra={"fs.s3a.committer.threads": "16", "spark.x.y": "z"},
    )
    assert c["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert c["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert c["spark.hadoop.fs.s3a.endpoint.region"] == "us-east-2"
    # bare fs.s3a.* keys get the spark.hadoop. prefix; spark.* pass as-is
    assert c["spark.hadoop.fs.s3a.committer.threads"] == "16"
    assert c["spark.x.y"] == "z"


def test_env_autowire_only_when_both_keys_present():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("AWS_ACCESS_KEY_ID", None)
        os.environ.pop("AWS_SECRET_ACCESS_KEY", None)
        assert s3a_confs_from_env() is None
    with mock.patch.dict(
        os.environ,
        {"AWS_ACCESS_KEY_ID": "AK", "AWS_SECRET_ACCESS_KEY": "SK", "AWS_REGION": "eu-west-1"},
    ):
        c = s3a_confs_from_env()
        assert c["spark.hadoop.fs.s3a.access.key"] == "AK"
        assert c["spark.hadoop.fs.s3a.endpoint.region"] == "eu-west-1"
        # The committer binding must NOT auto-wire from env: the commit
        # protocol class applies to every file write (local parquet
        # included) and plain pyspark ships no spark-hadoop-cloud jars,
        # so auto-binding would break purely local jobs on any machine
        # with ambient AWS credentials.
        for k in S3A_COMMITTER_CONFS:
            assert k not in c, k


def test_env_region_precedence_matches_boto3():
    # boto3 resolves AWS_REGION before AWS_DEFAULT_REGION; the docstring
    # claims parity, so the code must too.
    with mock.patch.dict(
        os.environ,
        {
            "AWS_ACCESS_KEY_ID": "AK",
            "AWS_SECRET_ACCESS_KEY": "SK",
            "AWS_REGION": "eu-west-1",
            "AWS_DEFAULT_REGION": "us-east-1",
        },
    ):
        c = s3a_confs_from_env()
        assert c["spark.hadoop.fs.s3a.endpoint.region"] == "eu-west-1"


def test_spark_hadoop_prefix_reaches_hadoop_configuration(spark):
    # The contract the whole block rests on: a spark.hadoop.X conf set
    # on the session propagates into the JVM-side Hadoop Configuration
    # object that s3a would read. Set a harmless fs.s3a knob via the
    # runtime conf API and read it back from hadoopConfiguration().
    spark.sparkContext._jsc.hadoopConfiguration().set(  # noqa: SLF001
        "fs.s3a.readahead.range", "1048576"
    )
    got = spark.sparkContext._jsc.hadoopConfiguration().get(  # noqa: SLF001
        "fs.s3a.readahead.range"
    )
    assert got == "1048576"
