"""Kafka SASL/SSL config -> Spark kafka option mapping, shared by the
source and sink (/root/reference/plugin/input/kafka/kafka.go:174-214,
plugin/output/kafka/kafka.go:154-194 — same field set on both sides;
e2e/kafka_auth exercises the full case table).

Client certificates: the reference hands PEM file paths to its Go TLS
config.  The JVM kafka client accepts PEM material directly via
``ssl.keystore.type=PEM`` with the key/cert chain INLINE, so the files
are read here and their contents passed as options — no JKS conversion
step for a drop-in swap.

``ssl_skip_verify`` maps to an empty
``ssl.endpoint.identification.algorithm`` (hostname verification off).
The JVM client offers no switch to skip chain validation entirely; a
self-signed broker still needs its CA in ``ca_cert``.  That is the
honest subset — documented divergence, not silent.
"""

from __future__ import annotations

SASL_MECHANISMS = ("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512", "AWS_MSK_IAM")


def kafka_security_options(cfg: dict) -> dict[str, str]:
    """file.d kafka security fields -> ``kafka.*`` options (without
    the reader/writer prefix handling — callers merge into their
    option map).  Unknown SASL mechanisms raise, like the reference's
    client constructor does (client.go NewClient fatals)."""
    opts: dict[str, str] = {}
    sasl = bool(cfg.get("is_sasl_enabled"))
    ssl = bool(cfg.get("is_ssl_enabled"))
    if sasl:
        mech = cfg.get("sasl_mechanism", "SCRAM-SHA-512")
        if mech not in SASL_MECHANISMS:
            raise ValueError(
                f"unknown SASL mechanism {mech!r}; one of {SASL_MECHANISMS}"
            )
        opts["kafka.sasl.mechanism"] = mech
        opts["kafka.security.protocol"] = "SASL_SSL" if ssl else "SASL_PLAINTEXT"
        if mech == "AWS_MSK_IAM":
            opts["kafka.sasl.jaas.config"] = (
                "software.amazon.msk.auth.iam.IAMLoginModule required;"
            )
            opts["kafka.sasl.client.callback.handler.class"] = (
                "software.amazon.msk.auth.iam.IAMClientCallbackHandler"
            )
        else:
            module = (
                "org.apache.kafka.common.security.plain.PlainLoginModule"
                if mech == "PLAIN"
                else "org.apache.kafka.common.security.scram.ScramLoginModule"
            )
            opts["kafka.sasl.jaas.config"] = (
                f'{module} required username="{cfg.get("sasl_username", "user")}" '
                f'password="{cfg.get("sasl_password", "password")}";'
            )
    elif ssl:
        opts["kafka.security.protocol"] = "SSL"
    if ssl:
        if cfg.get("ssl_skip_verify"):
            opts["kafka.ssl.endpoint.identification.algorithm"] = ""
        if cfg.get("ca_cert"):
            opts["kafka.ssl.truststore.type"] = "PEM"
            opts["kafka.ssl.truststore.certificates"] = _pem(cfg["ca_cert"])
        if cfg.get("client_cert") or cfg.get("client_key"):
            if not (cfg.get("client_cert") and cfg.get("client_key")):
                raise ValueError(
                    "client_cert and client_key must be set together"
                )
            opts["kafka.ssl.keystore.type"] = "PEM"
            opts["kafka.ssl.keystore.certificate.chain"] = _pem(cfg["client_cert"])
            opts["kafka.ssl.keystore.key"] = _pem(cfg["client_key"])
    return opts


def _pem(value: str) -> str:
    """Inline PEM passes through; a path is read (the reference's
    configs carry paths, kafka_auth/certs/*.pem)."""
    if "-----BEGIN" in value:
        return value
    with open(value) as fh:
        return fh.read()
