#!/usr/bin/env python3
"""Regenerate the /tmp/stress dataset used for scale validation:
sf0.1 TPC-H tables + 200k documents (2% planted near-dups) + 100k
64-dim embeddings. Deterministic (seed 7). Usage:
    python3 scripts/gen_stress.py [outdir]
"""
import sys, shutil, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
os.makedirs(out, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"/root/testdata/sf0.1/{t}.parquet", f"{out}/{t}.parquet")

rng = np.random.default_rng(7)
vocab = np.array(['key','agg','row','scan','slow','fast','table','value',
                  'part','hash','merge','batch','spark','a','the','line',
                  'sort','window','customer','query','big','data','column',
                  'join','small','stream','order','group','filter','vector',
                  'of','and','to','el','la','der','le'])
N = 200_000
lens = rng.integers(30, 90, N)
texts = [' '.join(vocab[rng.integers(0, len(vocab), lens[i])])
         for i in range(N)]
idx = rng.integers(0, N, N // 50)
for src in idx:
    t = texts[src].split(' ')
    for _ in range(2):
        t[rng.integers(0, len(t))] = str(vocab[rng.integers(0, len(vocab))])
    texts[(src + 1) % N] = ' '.join(t)
langs = rng.choice(['en','es','de','fr','zh'], N, p=[.4,.15,.15,.15,.15])
pq.write_table(pa.table({
    'doc_id': np.arange(N, dtype='int64'), 'text': texts, 'lang': langs,
    'source': [f'src{i%20}' for i in range(N)],
    'n_chars': np.array([len(t) for t in texts], dtype='int64')}),
    f"{out}/documents.parquet", row_group_size=20000)

M = 100_000
emb = rng.normal(0, 0.12, (M, 64)).astype('float32')
pq.write_table(pa.table({
    'vec_id': np.arange(M, dtype='int64'), 'embedding': list(emb),
    'label': rng.integers(0, 10, M).astype('int32')}),
    f"{out}/embeddings.parquet", row_group_size=10000)
print(f"wrote {out}: {N} docs, {M} embeddings")
