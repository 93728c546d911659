"""Public-suffix base-domain extraction (SURVEY F8).

The reference calls ``publicsuffix2.get_public_suffix`` per domain
(reference: ingestion/ct_ingestor.py:19, 39, 146-147), which — despite its
name — returns the registrable domain (eTLD+1): e.g.
``a.b.example.co.uk -> example.co.uk``.

That library is not available here, so this is a from-scratch
implementation of the standard Public Suffix List algorithm
(https://publicsuffix.org/list/ semantics: longest matching rule wins,
``*.`` wildcards, ``!`` exceptions) over an embedded subset of the PSL
covering the TLDs this engine's data uses plus the common multi-label
suffixes. The full list is a data file swap (``PSL_RULES``), not a code
change.

Spark integration: an Arrow-vectorized pandas UDF. The per-row work is a
dict lookup over at most len(labels) candidate suffixes — O(labels) — so
the UDF is cheap; it exists because the suffix *rules* are data, not
expressible as a closed-form Column expression. At 100 TB this runs
embarrassingly parallel in the ingest projection with no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Embedded PSL subset: normal rules, wildcard rules ("*.ck"), exceptions
# ("!www.ck"). Swap in the full https://publicsuffix.org/list/ file at prod.
PSL_RULES = """
com net org io rs me dev app info biz xyz co
ac.rs co.rs edu.rs gov.rs in.rs org.rs
co.uk org.uk ac.uk gov.uk me.uk net.uk
com.au net.au org.au edu.au gov.au
co.jp ne.jp or.jp ac.jp go.jp
com.br net.br org.br gov.br
co.in net.in org.in firm.in gen.in
com.cn net.cn org.cn gov.cn
de fr it es nl pl ru ch at be se no fi dk cz sk hu pt gr ie
ca us mx ar cl uk au jp br in cn kr tw hk sg
*.ck !www.ck
*.bd
github.io gitlab.io pages.dev netlify.app vercel.app herokuapp.com
s3.amazonaws.com cloudfront.net azurewebsites.net appspot.com
""".split()

_EXCEPTIONS = {r[1:] for r in PSL_RULES if r.startswith("!")}
_WILDCARDS = {r[2:] for r in PSL_RULES if r.startswith("*.")}
_NORMAL = {r for r in PSL_RULES if not r.startswith(("!", "*."))}


def public_suffix(domain: str | None) -> str | None:
    """The public suffix of ``domain`` (PSL algorithm, embedded rules)."""
    if not domain:
        return None
    labels = domain.lower().strip(".").split(".")
    if len(labels) < 2:
        return domain.lower() or None
    best = labels[-1]  # implicit '*' rule: unknown TLDs are themselves suffixes
    for i in range(len(labels)):
        cand = ".".join(labels[i:])
        parent = ".".join(labels[i + 1:])
        if cand in _EXCEPTIONS:
            # exception rule: the suffix is one label shorter
            if len(cand) < len(best) or best == labels[-1]:
                return parent
        if cand in _NORMAL and len(cand) > len(best):
            best = cand
        if parent in _WILDCARDS and len(cand) > len(best):
            best = cand
    return best


def base_domain(domain: str | None) -> str | None:
    """Registrable domain (eTLD+1) — replicates the reference's use of
    ``get_public_suffix`` (ct_ingestor.py:146-147): for ``www.example.co.uk``
    returns ``example.co.uk``; for a bare suffix returns it unchanged."""
    if not domain:
        return None
    d = domain.lower().strip(".")
    suffix = public_suffix(d)
    if suffix is None or d == suffix:
        return d or None
    prefix = d[: -(len(suffix) + 1)]
    if not prefix:
        return d
    return prefix.split(".")[-1] + "." + suffix


@pandas_udf(StringType())
def base_domain_udf(domains: pd.Series) -> pd.Series:
    """Arrow-vectorized base-domain extraction for the ingest pipeline."""
    return domains.map(base_domain)
