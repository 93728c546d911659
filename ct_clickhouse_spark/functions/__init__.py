"""Scalar function layer.

Everything the reference computes per-row in Python (SURVEY §2.6/§2.9) maps
to a Spark builtin except two, implemented here:
- domains.base_domain_udf — public-suffix base-domain extraction (F8)
- x509.parse_entries — CT MerkleTreeLeaf + X.509 DER parsing (F12)
"""
