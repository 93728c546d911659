#!/usr/bin/env python
"""Documents-only fixture for the LSH band-join growth-exponent probe
(r14 verdict #6): the 128 GiB single box cannot hold a full sf100
fixture generation (600M lineitem rows in numpy) alongside a Spark JVM,
but the minhash-LSH cost model's one binding 100 TB term — the banding
bucket-join shuffle under sort-merge — needs a decade-ish step above
sf30 measured on the real kernel. This generates ONLY the `documents`
table at a requested sf, reusing gen_sf.py's exact document recipe
(same vocab growth law, planted dup/near-dup/NULL structure, length
distribution).

NOT byte-identical to the documents table a full gen_sf.py run would
produce at the same sf: gen_sf draws every table from ONE sequential
rng, so skipping the upstream tables shifts the stream. Distribution-
identical is sufficient here — the probe measures shuffle/sort growth,
and the planted structure (the thing recall gates key on) is positional
(doc_id % rules), not rng-dependent. gen_sf.py already declares the
same non-byte-compat caveat vs the driver's own generator.

Usage: python scripts/gen_lsh_surrogate.py <out_dir> <sf>
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_sf import LANG_P, LANGS, SEED, VOCAB, _write  # noqa: E402


def generate_documents(out: str, sf: float) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    n_doc = max(500, int(50_000 * sf))
    n_vocab = max(len(VOCAB), round(len(VOCAB) * (sf / 0.1) ** (1 / 3)))
    vocab = np.array(VOCAB + [f"w{i}" for i in range(n_vocab - len(VOCAB))])
    lens = rng.integers(10, 101, n_doc)
    texts: list[str | None] = []
    for i in range(n_doc):
        if i % 500 == 2 and i >= 2:
            texts.append(texts[i - 2])  # exact duplicate
            continue
        if i % 100 == 1 and i >= 1:
            words = texts[i - 1].split(" ")
            for pos in rng.integers(0, len(words), 3):
                words[pos] = vocab[rng.integers(0, len(vocab))]
            texts.append(" ".join(words))  # near-duplicate
            continue
        if i % 211 == 7 and i % 100 != 0 and i % 500 != 0:
            texts.append(None)  # failed-extraction slice
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    _write(
        out,
        "documents",
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_P)],
            "source": [f"src{i % 20}" for i in range(n_doc)],
            "n_chars": pa.array(
                [len(t) if t is not None else None for t in texts],
                type=pa.int64(),
            ),
        },
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
    )
    print(f"documents: {n_doc} rows -> {out}")


if __name__ == "__main__":
    out_dir = sys.argv[1]
    scale = float(sys.argv[2])
    print(f"generating documents-only sf={scale} -> {out_dir}")
    generate_documents(out_dir, scale)
