"""CT MerkleTreeLeaf + X.509 parsing (SURVEY F9-F12, F14-F15).

The reference's single biggest piece of compute is ``parse_cert``
(reference: ingestion/ct_ingestor.py:114-143): base64-decode the CT
``leaf_input``, slice the RFC 6962 TLS struct to find the DER certificate,
parse it with ``cryptography.x509``, and emit (fingerprint, issuer,
subject, all-names, validity). Here that becomes one Arrow-batched
``mapInPandas`` stage returning a typed struct — the 10-100x-over-row-UDF
path — and everything downstream (explode to per-domain rows, lower-casing,
dedup) stays in JVM expressions.

RFC 6962 MerkleTreeLeaf layout (parsed at _extract_der):
  byte 0      version
  byte 1      leaf_type            (0 = timestamped_entry; others skipped,
                                    mirroring ct_ingestor.py:117-118)
  bytes 2-9   timestamp (ms)
  bytes 10-11 entry_type           (0 = x509_entry, 1 = precert_entry)
  bytes 12-14 3-byte big-endian DER length   (x509_entry only)
  bytes 15-   DER certificate
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

try:
    from cryptography import x509 as _x509
    from cryptography.x509.oid import ExtensionOID, NameOID

    HAVE_CRYPTOGRAPHY = True
except ImportError:  # pragma: no cover - baked into this container
    HAVE_CRYPTOGRAPHY = False

PARSED_SCHEMA = StructType(
    [
        StructField("log_name", StringType()),
        StructField("entry_index", LongType()),
        StructField("fingerprint", StringType()),
        StructField("issuer", StringType()),
        StructField("subject", StringType()),
        StructField("domains", ArrayType(StringType())),
        StructField("not_before", TimestampNTZType()),
        StructField("not_after", TimestampNTZType()),
    ]
)


def extract_der(leaf_input: bytes) -> bytes | None:
    """DER certificate out of a MerkleTreeLeaf; None for non-x509 leaves
    (the reference skips leaf_type != 0, ct_ingestor.py:117-118, and only
    handles plain x509 entries)."""
    if leaf_input is None or len(leaf_input) < 15:
        return None
    if leaf_input[1] != 0:  # not timestamped_entry
        return None
    entry_type = int.from_bytes(leaf_input[10:12], "big")
    if entry_type != 0:  # precert entries carry a TBS, not the full DER
        return None
    length = int.from_bytes(leaf_input[12:15], "big")
    der = leaf_input[15 : 15 + length]
    return der if len(der) == length else None


def parse_cert_der(der: bytes) -> dict[str, Any] | None:
    """(fingerprint, issuer, subject, unique lowercased names, validity)
    from a DER cert — the reference's parse_cert (ct_ingestor.py:114-143).
    Returns None on unparseable certs (skipped, ct_ingestor.py:186-187)."""
    if not HAVE_CRYPTOGRAPHY:
        raise NotImplementedError(
            "cryptography not installed: X.509 parsing is stubbed; "
            "the Spark-side plumbing (schema/batching) is still testable"
        )
    try:
        cert = _x509.load_der_x509_certificate(der)
        names: list[str] = []
        for attr in cert.subject.get_attributes_for_oid(NameOID.COMMON_NAME):
            if isinstance(attr.value, str) and attr.value:
                names.append(attr.value.lower())
        try:
            san = cert.extensions.get_extension_for_oid(
                ExtensionOID.SUBJECT_ALTERNATIVE_NAME
            )
            names.extend(n.lower() for n in san.value.get_values_for_type(_x509.DNSName))
        except _x509.ExtensionNotFound:
            pass
        seen: dict[str, None] = dict.fromkeys(n for n in names if n)
        return {
            "fingerprint": hashlib.sha256(der).hexdigest(),
            "issuer": cert.issuer.rfc4514_string(),
            "subject": cert.subject.rfc4514_string(),
            "domains": list(seen),
            "not_before": cert.not_valid_before_utc.replace(tzinfo=None),
            "not_after": cert.not_valid_after_utc.replace(tzinfo=None),
        }
    except Exception:
        return None


def parse_entries(raw: DataFrame) -> DataFrame:
    """mapInPandas stage: (log_name, entry_index, leaf_input binary) ->
    PARSED_SCHEMA rows. Arrow-batched; certs that fail to parse or carry
    no domain are dropped (ct_ingestor.py:186-188)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for log_name, idx, leaf in zip(
                pdf["log_name"], pdf["entry_index"], pdf["leaf_input"]
            ):
                der = extract_der(bytes(leaf)) if leaf is not None else None
                if der is None:
                    continue
                parsed = parse_cert_der(der)
                if parsed is None or not parsed["domains"]:
                    continue
                out.append({"log_name": log_name, "entry_index": idx, **parsed})
            yield pd.DataFrame(
                out,
                columns=[f.name for f in PARSED_SCHEMA.fields],
            )

    return raw.mapInPandas(_parse, PARSED_SCHEMA)
