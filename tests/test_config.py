"""Config/env layer: the reference's exact env wire shapes parse into
typed chain bindings and project onto Spark source options.

The CHAINS fixture string below is byte-identical to the reference's
own serialization test (src/config/chain.rs:39-61), so a deployment's
env block drops in unchanged.
"""

from __future__ import annotations

import pytest

from evmtrace_etl_spark.config import (
    Config,
    KafkaChainConfig,
    KafkaConfig,
    ProviderChainConfig,
    parse_chain,
)

REFERENCE_CHAINS = (
    '[{"Provider":[1,"http://localhost:8545","ws://localhost:8546",'
    'true,true]},{"Kafka":[2,"traces","blocks"]}]'
)

BASE_ENV = {
    "POSTGRES_HOST": "pg.internal",
    "POSTGRES_USERNAME": "etl",
    "POSTGRES_PASSWORD": "s3cret",
    "POSTGRES_DB": "evm",
}


def test_reference_chains_wire_format_parses():
    cfg = Config.from_env({**BASE_ENV, "CHAINS": REFERENCE_CHAINS})
    assert cfg.chains == (
        ProviderChainConfig(
            1, "http://localhost:8545", "ws://localhost:8546", True, True
        ),
        KafkaChainConfig(2, "traces", "blocks"),
    )
    assert cfg.provider_chains()[0].index_tx is True
    assert cfg.kafka_chains()[0].id == 2


def test_full_env_surface():
    cfg = Config.from_env(
        {
            **BASE_ENV,
            "KAFKA": '["broker:9092","etl-group","u","p"]',
            "REDIS_URL": "redis://cache:6379",
            "CHAINS": '[{"Kafka":[5,"t5",null]}]',
            "PORT": "9000",
        }
    )
    assert cfg.kafka == KafkaConfig("broker:9092", "etl-group", "u", "p")
    assert cfg.redis_url == "redis://cache:6379"
    assert cfg.port == 9000
    # null topic → no binding for that stream
    assert cfg.kafka_chains()[0].blocks_topic is None
    assert cfg.postgres.dsn() == (
        "host=pg.internal user=etl password=s3cret dbname=evm"
    )
    assert cfg.postgres.jdbc_url() == "jdbc:postgresql://pg.internal/evm"


def test_defaults_match_reference():
    cfg = Config.from_env(BASE_ENV)
    assert cfg.kafka is None
    assert cfg.redis_url is None
    assert cfg.chains == ()
    assert cfg.port == 8080  # reference config.rs:61 default


def test_missing_postgres_raises():
    with pytest.raises(ValueError, match="POSTGRES"):
        Config.from_env({"POSTGRES_HOST": "h"})


@pytest.mark.parametrize(
    "bad",
    [
        {"Provider": [1, "r", "w", True]},  # short tuple
        {"Kafka": [1, "t"]},
        {"Other": [1]},
        {"Provider": [1], "Kafka": [1]},  # two tags
    ],
)
def test_malformed_chain_rejected(bad):
    with pytest.raises(ValueError):
        parse_chain(bad)


def test_kafka_source_options_translate_sasl():
    cfg = Config.from_env(
        {**BASE_ENV, "KAFKA": '["b:9092","grp","user","pw"]'}
    )
    opts = cfg.kafka_source_options()
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-256"
    assert 'username="user"' in opts["kafka.sasl.jaas.config"]
    assert opts["groupIdPrefix"] == "grp"


def test_kafka_chains_without_binding_raises(spark):
    cfg = Config.from_env(
        {**BASE_ENV, "CHAINS": '[{"Kafka":[2,"traces","blocks"]}]'}
    )
    with pytest.raises(ValueError, match="no KAFKA binding"):
        cfg.chain_streams(spark)


def test_chain_streams_bind_only_declared_topics(spark, tmp_path):
    """Per-chain spawn loop parity: one decoded stream per bound topic,
    none for null topics, keyed by chain id — exercised with the
    file-stream analogs standing in for the Kafka sources."""
    import json as _json

    from evmtrace_etl_spark.streaming import sources as s

    trace_dir = tmp_path / "traces"
    trace_dir.mkdir()
    # empty dir is fine — streams are lazily planned, not started
    calls = []

    def fake_trace(spark_, url, topic, chain_id):
        calls.append(("traces", url, topic, chain_id))
        return s.file_trace_stream(spark_, str(trace_dir))

    def fake_block(spark_, url, topic, chain_id):
        calls.append(("blocks", url, topic, chain_id))
        return s.file_block_stream(spark_, str(trace_dir))

    cfg = Config.from_env(
        {
            **BASE_ENV,
            "KAFKA": '["b:9092","grp","u","p"]',
            "CHAINS": _json.dumps(
                [
                    {"Kafka": [1, "zk.traces", "zk.blocks"]},
                    {"Kafka": [2, "l2.traces", None]},
                    {"Provider": [3, "http://r", "ws://w", True, False]},
                ]
            ),
        }
    )
    streams = cfg.chain_streams(
        spark, trace_stream=fake_trace, block_stream=fake_block
    )
    assert set(streams) == {1, 2}
    assert set(streams[1]) == {"traces", "blocks"}
    assert set(streams[2]) == {"traces"}  # null blocks_topic → unbound
    assert ("traces", "b:9092", "l2.traces", 2) in calls
    for chain_streams in streams.values():
        for df in chain_streams.values():
            assert df.isStreaming
