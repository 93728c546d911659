"""Test-fixture generator: deterministic self-signed certs wrapped in
RFC 6962 MerkleTreeLeaf structures, written as recorded CT log directories
(the ct_log source's offline wire format)."""

from __future__ import annotations

import base64
import datetime
import json
import os

from cryptography import x509
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import ec
from cryptography.hazmat.primitives.serialization import Encoding
from cryptography.x509.oid import NameOID

_EPOCH = datetime.datetime(2024, 1, 1)
_DEFAULT_TS_MS = 1704067200000  # 2024-01-01T00:00:00Z


def make_cert_der(
    domains: list[str],
    serial: int,
    not_before: datetime.datetime | None = None,
    days: int = 90,
) -> bytes:
    """Self-signed cert: first domain is the CN, all domains are SANs.
    ``not_before``/``days`` parameterize validity so regenerated fixtures
    can carry current-era dates (r13 verdict #8)."""
    nb = not_before if not_before is not None else _EPOCH
    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, domains[0])])
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(serial)
        .not_valid_before(nb)
        .not_valid_after(nb + datetime.timedelta(days=days))
        .add_extension(
            x509.SubjectAlternativeName([x509.DNSName(d) for d in domains]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    return cert.public_bytes(Encoding.DER)


def wrap_leaf(
    der: bytes,
    leaf_type: int = 0,
    entry_type: int = 0,
    ts_ms: int = _DEFAULT_TS_MS,
) -> bytes:
    """MerkleTreeLeaf: version, leaf_type, timestamp(8), entry_type(2),
    3-byte length, DER (RFC 6962 §3.4)."""
    return (
        bytes([0, leaf_type])
        + ts_ms.to_bytes(8, "big")
        + entry_type.to_bytes(2, "big")
        + len(der).to_bytes(3, "big")
        + der
    )


def write_log_dir(
    base: str, log_name: str, leaves: list[bytes], tree_size: int | None = None
) -> None:
    d = os.path.join(base, log_name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "sth.json"), "w") as f:
        json.dump({"tree_size": tree_size if tree_size is not None else len(leaves)}, f)
    with open(os.path.join(d, "entries.jsonl"), "w") as f:
        for leaf in leaves:
            f.write(json.dumps({"leaf_input": base64.b64encode(leaf).decode()}) + "\n")
