#!/usr/bin/env python
"""Adversarial eval fixture (VERDICT r8 #3): the synthetic driver
corpus is too easy for the eval ops — every document is English-ish
('lang' is a label, not a property of the text) and the embeddings are
near-isotropic (so Matryoshka prefixes and PQ sit on geometry with no
structure to exploit or lose). This tool writes a HARD corpus under a
scratch dir with the fixture tables' exact schemas:

- documents.parquet — genuinely multilingual marker text: five
  languages whose token streams embed each language's own marker
  stopwords (the signal text_langid keys on) mixed with shared and
  language-specific filler, plus an 'und' slice with no markers at
  all. text_langid_eval on this corpus measures a real confusion
  matrix instead of calling everything 'en'.
- embeddings.parquet — anisotropic, clustered vectors: K cluster
  centers + noise pushed through a fixed decaying-spectrum linear map
  (variance concentrated in the leading dimensions, the geometry MRL
  training produces) and then L2-normalized. Matryoshka prefixes are
  MEANINGFUL here (low-dim recall should approach 1.0), IVF has real
  clusters to quantize, and PQ subspaces see correlated coordinates —
  the setting where OPQ would matter if recall dropped.
- orders.parquet (o_orderpriority, o_totalprice only) — heavy-tailed
  (lognormal σ=2.5) money values: the adversarial input for the
  sketch-bracketed exact-percentile engine, whose band-coverage
  assert must hold on distributions far from the TPC-H-ish uniform.

Deterministic (fixed seeds); ~1s to generate the default sizes.

Usage:  python tools/gen_hard_fixture.py [--dir /tmp/sparkify_hard_v1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd

_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de5", "shi4", "bu4", "le5", "ren2"],
}
# Language-specific filler vocabularies (no marker collisions).
_FILLER = {
    "en": ["house", "river", "light", "stone", "night", "green"],
    "de": ["haus", "fluss", "licht", "stein", "nacht", "gruen"],
    "es": ["casa", "rio", "luz", "piedra", "noche", "verde"],
    "fr": ["maison", "riviere", "lumiere", "pierre", "nuit", "vert"],
    "zh": ["shan1", "shui3", "huo3", "mu4", "tian1", "di4"],
}


def gen_documents(n_per_lang: int = 40, seed: int = 11) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    rows = []
    doc_id = 0
    for lang in _MARKERS:
        for _ in range(n_per_lang):
            n_words = int(rng.randint(30, 120))
            # ~25% markers of the TRUE language, rest filler; a pinch
            # of cross-language filler so the task isn't trivially
            # separable on vocabulary alone
            words = []
            for _w in range(n_words):
                r = rng.rand()
                if r < 0.25:
                    words.append(
                        _MARKERS[lang][rng.randint(len(_MARKERS[lang]))]
                    )
                elif r < 0.9:
                    words.append(
                        _FILLER[lang][rng.randint(len(_FILLER[lang]))]
                    )
                else:
                    other = list(_FILLER)[rng.randint(5)]
                    words.append(
                        _FILLER[other][rng.randint(len(_FILLER[other]))]
                    )
            text = " ".join(words)
            rows.append((doc_id, text, lang, f"src_{lang}", len(text)))
            doc_id += 1
    # an unmarked slice: numbers only -> no marker hits -> 'und'
    for _ in range(n_per_lang // 2):
        text = " ".join(
            str(rng.randint(1000, 9999)) for _ in range(rng.randint(20, 60))
        )
        rows.append((doc_id, text, "und", "src_und", len(text)))
        doc_id += 1
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def gen_embeddings(
    n: int = 4096, dim: int = 64, k: int = 10, seed: int = 13
) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    centers = rng.normal(0.0, 1.0, (k, dim))
    labels = rng.randint(0, k, n)
    x = centers[labels] + rng.normal(0.0, 0.35, (n, dim))
    # fixed anisotropic map: random rotation x decaying spectrum —
    # leading dimensions carry most of the variance (MRL-like geometry)
    q, _ = np.linalg.qr(rng.normal(0.0, 1.0, (dim, dim)))
    spectrum = 0.88 ** np.arange(dim)
    x = x @ q * spectrum
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in x],
            "label": labels.astype(np.int32),
        }
    )


def gen_orders(n: int = 60000, seed: int = 17) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    prio = rng.randint(1, 6, n)
    vals = np.round(np.exp(rng.normal(7.0, 2.5, n)), 2)  # heavy tail
    return pd.DataFrame(
        {
            "o_orderpriority": [f"{p}-P" for p in prio],
            "o_totalprice": vals,
        }
    )


def write_fixture(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    gen_documents().to_parquet(
        os.path.join(out_dir, "documents.parquet"), index=False
    )
    gen_embeddings().to_parquet(
        os.path.join(out_dir, "embeddings.parquet"), index=False
    )
    gen_orders().to_parquet(
        os.path.join(out_dir, "orders.parquet"), index=False
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sparkify_hard_v1")
    args = ap.parse_args()
    write_fixture(args.dir)
    print(f"hard fixture written to {args.dir}")


if __name__ == "__main__":
    main()
