"""Python UDTF surface (SURVEY §2.9).

The reference's only table-generating pattern is the per-domain fan-out
loop (ct_ingestor.py:189-203), which the engine expresses as explode().
This module exercises Spark 4's *user-defined table function* path with a
real operator: expanding a domain into its ancestor chain
(``www.a.example.com -> www.a.example.com, a.example.com, example.com,
com``) — the lookup structure subdomain-matching queries need.

The same semantics are deliberately SQL-expressible so the UDTF execution
path gets a DuckDB oracle (list_slice suffixes), mirroring how the
applyInPandas UDAF is validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="ancestor string, depth int")
class DomainChainUDTF:
    """One row per ancestor suffix of the input domain."""

    def eval(self, domain: str):  # noqa: D102
        if not domain:
            return
        labels = domain.split(".")
        for i in range(len(labels)):
            yield ".".join(labels[i:]), i


def register(spark: SparkSession) -> None:
    spark.udtf.register("domain_chain", DomainChainUDTF)


def domain_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor chains of the distinct .rs domains in cert_domains,
    via a LATERAL join against the Python UDTF."""
    from ..cert_domains import build_cert_domains

    build_cert_domains(spark, sf_dir)
    register(spark)
    return spark.sql(
        """
        SELECT d.domain, c.ancestor, c.depth
        FROM (SELECT DISTINCT domain FROM cert_domains
              WHERE domain LIKE '%.rs') d,
             LATERAL domain_chain(d.domain) c
        ORDER BY d.domain, c.depth
        """
    )


QUERIES = {"udtf_domain_ancestors": domain_ancestors}

ORACLES: dict[str, str] = {}


def _oracle() -> str:
    from ..cert_domains import oracle_with_cert_domains

    return oracle_with_cert_domains(
        """
        SELECT domain, array_to_string(list_slice(labels, i, len(labels)), '.') AS ancestor,
               CAST(i - 1 AS INT) AS depth
        FROM (
            SELECT DISTINCT domain, string_split(domain, '.') AS labels
            FROM cert_domains WHERE domain LIKE '%.rs'
        ), unnest(range(1, len(labels) + 1)) AS t(i)
        ORDER BY domain, depth
        """
    )


ORACLES["udtf_domain_ancestors"] = _oracle()
