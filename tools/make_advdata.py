#!/usr/bin/env python3
"""Build an adversarial test-corpus directory for the oracle gate.

Usage: python3 tools/make_advdata.py [/tmp/advdata]
Then:  sbt -batch "runMain graft.Verify /tmp/advdata /tmp/verify_adv"
       python3 tools/oracle_check.py /tmp/advdata /tmp/verify_adv

Copies the sf0.001 TPC-H-ish tables and replaces documents/embeddings
with edge-case rows: empty / whitespace-only / single-token text,
unicode and non-BMP emoji, stopword-dense docs in all four languages,
repeated tokens, quoting characters, plus zero / negative / huge /
near-denormal embedding vectors. Expected result: every query passes
(oracle_check.py re-points q61's path-pinned oracle at the corpus
dir, so q61 is a real check here too).

This corpus is how the zero-norm cosine crash was found: under ANSI
mode (Spark 4 default) an unguarded cosine division THROWS on the
first all-zero vector.
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

src = '/root/testdata/sf0.001'
dst = sys.argv[1] if len(sys.argv) > 1 else '/tmp/advdata'
shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in os.listdir(src):
    if f not in ('documents.parquet', 'embeddings.parquet'):
        shutil.copy(f'{src}/{f}', f'{dst}/{f}')

texts = [
    "", " ", "   ", "a", "a b", "a b c",
    "the the the the the the",
    "é ü ñ 日本語 中文 한국어 русский",
    "🚀 🌍 🎉 🚀 🌍 🎉 🚀",
    "a\tb\tc d e f",
    "x'y \"quo\" `tick` \\slash",
    "word " * 200,
    "the a of and to in is it extra",
    "el la de y en es que un más",
    "der die das und ist ein zu mit",
    "le les et est dans pour sur une",
    "a b c d e f g h i j",
    "A B C D E F G H I J",
    "0 1 2 3 4 5 6 7 8 9 10 11",
    "dup dup dup dup dup dup",
] + [f"shared prefix tokens w{i} w{i + 1} w{i + 2} tail common ending"
     for i in range(12)]
docs = pa.table({
    'doc_id': pa.array(range(len(texts)), pa.int64()),
    'text': pa.array(texts, pa.string()),
    'lang': pa.array([['en', 'es', 'de', 'fr'][i % 4]
                      for i in range(len(texts))], pa.string()),
    'source': pa.array([f's{i % 3}' for i in range(len(texts))],
                       pa.string()),
    'n_chars': pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(docs, f'{dst}/documents.parquet')

random.seed(7)
vecs = []
for i in range(48):
    if i == 0:
        v = [0.0] * 64                  # zero vector (norm 0)
    elif i == 1:
        v = [1e-30] * 64                # near-denormal
    elif i == 2:
        v = [-1.0] * 64                 # all-negative
    elif i == 3:
        v = [3.4e38 / 100] * 64         # huge magnitudes
    elif i == 4:
        v = [0.0] * 63 + [1.0]          # near-zero
    else:
        v = [random.uniform(-1, 1) for _ in range(64)]
    vecs.append([float(pa.scalar(x, pa.float32()).as_py()) for x in v])
emb = pa.table({
    'vec_id': pa.array(range(48), pa.int64()),
    'embedding': pa.array(vecs, pa.list_(pa.float32())),
    'label': pa.array([i % 5 for i in range(48)], pa.int32()),
})
pq.write_table(emb, f'{dst}/embeddings.parquet')
print(f'wrote {len(texts)} adversarial docs and 48 vectors to {dst}')
