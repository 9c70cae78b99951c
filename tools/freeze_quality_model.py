"""Freeze the learned quality classifier into checked-in coefficients.

Fits a hashed-ngram (unigram + bigram) logistic regression on the
sf0.01 documents table with label lang=='en', then writes the
coefficient vector as INTEGER micro-units (coef * 1e6, rounded) to
kineo_spark/pipeline/quality_coefs.json.

Why integers: the scoring path (Spark) and the oracle (DuckDB) both
compute logit_micro = intercept_micro + SUM(cnt * coef_micro) in exact
int64 arithmetic, so the hash comparison is immune to float summation
order. Feature hashing is md5-hex-prefix mod n — identical in both
engines (same trick as the pipe_temperature_sample oracle).

Training is deterministic: full-batch IRLS (Newton) from a zero init,
fixed iteration count, no RNG anywhere. Re-running this script on the
same parquet reproduces the same JSON bit-for-bit.

Usage: python tools/freeze_quality_model.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np

N_FEATURES = 512
L2 = 1e-3
ITERS = 30

FEATURE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> len(x) > 0) AS w
  FROM documents),
terms AS (
  SELECT doc_id, unnest(w) AS term FROM toks
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i + 1])) AS term
  FROM toks)
SELECT doc_id,
       CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % {n} AS idx,
       COUNT(*) AS cnt
FROM terms GROUP BY doc_id, idx
"""


def fit(sf_dir: str):
    con = duckdb.connect()
    path = os.path.join(sf_dir, "documents.parquet").replace("'", "''")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
    )
    rows = con.execute(FEATURE_SQL.format(n=N_FEATURES)).fetchall()
    labels = dict(
        con.execute(
            "SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END "
            "FROM documents"
        ).fetchall()
    )
    doc_ids = sorted(labels)
    pos = {d: i for i, d in enumerate(doc_ids)}
    X = np.zeros((len(doc_ids), N_FEATURES))
    for doc_id, idx, cnt in rows:
        X[pos[doc_id], idx] = cnt
    y = np.array([float(labels[d]) for d in doc_ids])

    # IRLS / Newton with L2 on weights (not the intercept).
    Xb = np.hstack([np.ones((len(doc_ids), 1)), X])
    w = np.zeros(N_FEATURES + 1)
    reg = np.full(N_FEATURES + 1, L2)
    reg[0] = 0.0
    for _ in range(ITERS):
        z = Xb @ w
        p = 1.0 / (1.0 + np.exp(-np.clip(z, -30, 30)))
        g = Xb.T @ (p - y) + reg * w
        s = np.clip(p * (1 - p), 1e-6, None)
        H = (Xb * s[:, None]).T @ Xb + np.diag(reg + 1e-8)
        w -= np.linalg.solve(H, g)
    acc = float(np.mean((Xb @ w > 0) == (y == 1)))
    return w, acc


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    w, acc = fit(sf_dir)
    out = {
        "n_features": N_FEATURES,
        "hashing": "CAST(('0x'||substring(md5(term),1,8)) AS BIGINT) % n",
        "features": "lowercased whitespace unigrams + space-joined bigrams",
        "trained_on": os.path.basename(sf_dir.rstrip("/"))
        + " documents, label lang=='en'",
        "train_accuracy": round(acc, 4),
        "intercept_micro": int(round(w[0] * 1e6)),
        "coef_micro": [int(round(c * 1e6)) for c in w[1:]],
    }
    dest = os.path.join(
        os.path.dirname(__file__), "..", "kineo_spark", "pipeline",
        "quality_coefs.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.normpath(dest)}: train acc {acc:.4f}, "
          f"intercept_micro {out['intercept_micro']}, "
          f"{sum(1 for c in out['coef_micro'] if c)} nonzero coefs")


if __name__ == "__main__":
    main()
