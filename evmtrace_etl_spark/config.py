"""Environment-driven configuration — the reference's config layer
re-expressed for a Spark deployment.

The reference parses five env vars into a process-global config
(/root/reference/src/config.rs:44-66):

- ``KAFKA``    — JSON tuple ``[url, group_id, username, password]``
- ``POSTGRES_HOST/_USERNAME/_PASSWORD/_DB`` — required sink DSN parts
- ``REDIS_URL`` — optional dedup-cache URL (our sinks keep the seen-key
  set in the sink's own versioned state instead, so this is carried but
  unused by the Spark paths)
- ``CHAINS``   — JSON list of externally-tagged chain bindings, each
  ``{"Provider": [id, rpc_url, ws_url, index_block, index_tx]}`` or
  ``{"Kafka": [id, traces_topic, blocks_topic]}``
  (/root/reference/src/config/chain.rs:10-24; tuple encodings pinned by
  the reference's own serialization test, chain.rs:39-61)
- ``PORT``     — health/metrics endpoint port, default 8080

This module parses the SAME wire shapes (so a reference deployment's
env block drops in unchanged) and maps them to Spark-idiomatic
surfaces: ``kafka_source_options()`` yields the option dict for
``spark.readStream.format("kafka")`` (SASL/SCRAM-256 translated from
the reference's librdkafka keys, config.rs:100-110), and
``chain_streams()`` binds each Kafka chain to its per-topic stream
constructors.  Everything is plain-args constructible too — env is one
way in, not the only one.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class KafkaConfig:
    """Broker + SASL identity (reference ``KAFKA`` tuple)."""

    url: str
    group_id: str
    username: str
    password: str

    @classmethod
    def from_json(cls, raw: str) -> "KafkaConfig":
        vals = json.loads(raw)
        if not isinstance(vals, list) or len(vals) != 4:
            raise ValueError(
                "KAFKA must be a JSON array [url, group_id, username, "
                f"password]; got {raw!r}"
            )
        return cls(*[str(v) for v in vals])


@dataclass(frozen=True)
class PostgresConfig:
    host: str
    username: str
    password: str
    db: str

    def dsn(self) -> str:
        """libpq-style DSN for the DB-API sinks."""
        return (
            f"host={self.host} user={self.username} "
            f"password={self.password} dbname={self.db}"
        )

    def jdbc_url(self) -> str:
        """JDBC URL for ``df.write.jdbc`` paths (credentials go in
        properties, never the URL)."""
        return f"jdbc:postgresql://{self.host}/{self.db}"

    def jdbc_properties(self) -> dict[str, str]:
        return {
            "user": self.username,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }


@dataclass(frozen=True)
class ProviderChainConfig:
    """RPC/WS-fed chain (reference chain.rs:10-17)."""

    id: int
    rpc_url: str
    ws_url: str
    index_block: bool
    index_tx: bool


@dataclass(frozen=True)
class KafkaChainConfig:
    """Topic-fed chain (reference chain.rs:19-24).  Either topic may be
    None — the reference spawns a consumer only for bound topics."""

    id: int
    traces_topic: str | None
    blocks_topic: str | None


Chain = ProviderChainConfig | KafkaChainConfig


def parse_chain(entry: dict) -> Chain:
    """One externally-tagged CHAINS element → typed config."""
    if not isinstance(entry, dict) or len(entry) != 1:
        raise ValueError(f"chain entry must have exactly one tag: {entry!r}")
    tag, vals = next(iter(entry.items()))
    if tag == "Provider":
        if len(vals) != 5:
            raise ValueError(f"Provider tuple must have 5 fields: {vals!r}")
        return ProviderChainConfig(
            int(vals[0]), str(vals[1]), str(vals[2]),
            bool(vals[3]), bool(vals[4]),
        )
    if tag == "Kafka":
        if len(vals) != 3:
            raise ValueError(f"Kafka tuple must have 3 fields: {vals!r}")
        return KafkaChainConfig(
            int(vals[0]),
            None if vals[1] is None else str(vals[1]),
            None if vals[2] is None else str(vals[2]),
        )
    raise ValueError(f"unknown chain tag {tag!r} (want Provider|Kafka)")


@dataclass(frozen=True)
class Config:
    postgres: PostgresConfig
    kafka: KafkaConfig | None = None
    redis_url: str | None = None
    chains: tuple[Chain, ...] = field(default_factory=tuple)
    port: int = 8080

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "Config":
        """Parse the reference's exact env surface.  Missing POSTGRES_*
        raises (the reference ``expect``s them); everything else is
        optional with the reference's defaults."""
        env = os.environ if env is None else env
        try:
            pg = PostgresConfig(
                host=env["POSTGRES_HOST"],
                username=env["POSTGRES_USERNAME"],
                password=env["POSTGRES_PASSWORD"],
                db=env["POSTGRES_DB"],
            )
        except KeyError as missing:
            raise ValueError(f"POSTGRES env var {missing} must be set")
        kafka = (
            KafkaConfig.from_json(env["KAFKA"]) if "KAFKA" in env else None
        )
        chains_raw = json.loads(env.get("CHAINS", "[]"))
        if not isinstance(chains_raw, list):
            raise ValueError("CHAINS must be a JSON array")
        return cls(
            postgres=pg,
            kafka=kafka,
            redis_url=env.get("REDIS_URL"),
            chains=tuple(parse_chain(c) for c in chains_raw),
            port=int(env.get("PORT", "8080")),
        )

    # -- Spark-facing projections ------------------------------------

    def kafka_source_options(self) -> dict[str, str]:
        """Options for ``spark.readStream.format("kafka")`` — the
        structured-streaming translation of the reference's librdkafka
        client config (config.rs:100-110).  Offsets/group semantics
        differ by design: Spark tracks offsets in the checkpoint, so
        ``groupIdPrefix`` (not a fixed ``group.id``) is the idiomatic
        mapping of the reference's consumer group."""
        if self.kafka is None:
            raise ValueError("no KAFKA binding configured")
        jaas = (
            "org.apache.kafka.common.security.scram.ScramLoginModule "
            f'required username="{self.kafka.username}" '
            f'password="{self.kafka.password}";'
        )
        return {
            "kafka.bootstrap.servers": self.kafka.url,
            "kafka.security.protocol": "SASL_PLAINTEXT",
            "kafka.sasl.mechanism": "SCRAM-SHA-256",
            "kafka.sasl.jaas.config": jaas,
            "groupIdPrefix": self.kafka.group_id,
            "startingOffsets": "earliest",
        }

    def kafka_chains(self) -> list[KafkaChainConfig]:
        return [c for c in self.chains if isinstance(c, KafkaChainConfig)]

    def provider_chains(self) -> list[ProviderChainConfig]:
        return [
            c for c in self.chains if isinstance(c, ProviderChainConfig)
        ]

    def chain_streams(
        self,
        spark: SparkSession,
        trace_stream: Callable[..., DataFrame] | None = None,
        block_stream: Callable[..., DataFrame] | None = None,
    ) -> dict[int, dict[str, DataFrame]]:
        """Bind every Kafka chain to its decoded streams — the Spark
        counterpart of the reference's per-chain consumer spawn loop
        (main.rs): one ``{"traces": df, "blocks": df}`` entry per chain
        id, only for the topics the chain actually binds.

        ``trace_stream``/``block_stream`` default to the real Kafka
        sources; tests inject the file-stream analogs.
        """
        from .streaming import sources as _sources

        trace_stream = trace_stream or _sources.kafka_trace_stream
        block_stream = block_stream or _sources.kafka_block_stream
        chains = self.kafka_chains()
        uses_default = (
            trace_stream is _sources.kafka_trace_stream
            or block_stream is _sources.kafka_block_stream
        )
        if chains and self.kafka is None and uses_default:
            raise ValueError("CHAINS has Kafka chains but no KAFKA binding")
        out: dict[int, dict[str, DataFrame]] = {}
        for chain in chains:
            streams: dict[str, DataFrame] = {}
            if chain.traces_topic is not None:
                streams["traces"] = trace_stream(
                    spark,
                    self.kafka.url if self.kafka else "",
                    chain.traces_topic,
                    chain.id,
                )
            if chain.blocks_topic is not None:
                streams["blocks"] = block_stream(
                    spark,
                    self.kafka.url if self.kafka else "",
                    chain.blocks_topic,
                    chain.id,
                )
            if streams:
                out[chain.id] = streams
        return out
