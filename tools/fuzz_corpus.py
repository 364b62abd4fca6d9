#!/usr/bin/env python3
"""Randomized cross-engine fuzz corpus for the oracle gate.

Usage: python3 tools/fuzz_corpus.py <seed> [/tmp/fuzzdata]
Then:  sbt -batch "runMain graft.Verify /tmp/fuzzdata /tmp/verify_fuzz"
       python3 tools/oracle_check.py /tmp/fuzzdata /tmp/verify_fuzz

Random documents with a Zipf-ish vocabulary (so shingles collide and
near-dup machinery does real work), deliberate near-duplicate pairs,
random languages/sources, and random embeddings with planted
duplicates. Expected: ALL queries pass (oracle_check.py re-points
q61's path-pinned oracle at the corpus dir). Different seeds explore
different corners; any FAIL is a genuine cross-engine divergence
worth a bug report.
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/fuzzdata'
rng = random.Random(seed)

src = '/root/testdata/sf0.001'
shutil.rmtree(dst, ignore_errors=True)
os.makedirs(dst)
for f in os.listdir(src):
    if f not in ('documents.parquet', 'embeddings.parquet'):
        shutil.copy(f'{src}/{f}', f'{dst}/{f}')

vocab = [f'w{i}' for i in range(50)] + \
    ['the', 'a', 'of', 'el', 'la', 'der', 'die', 'le', 'les',
     'é', '日本', '🚀', '1', '42', 'x.y@z.io']


def doc():
    n = rng.randint(0, 40)
    return ' '.join(rng.choices(vocab, weights=range(len(vocab), 0, -1),
                                k=n))


texts = [doc() for _ in range(300)]
for i in range(0, 30, 3):  # planted near-duplicates
    texts[i + 1] = texts[i]
    texts[i + 2] = (texts[i] + ' extra').strip()
docs = pa.table({
    'doc_id': pa.array(range(len(texts)), pa.int64()),
    'text': pa.array(texts, pa.string()),
    'lang': pa.array([rng.choice(['en', 'es', 'de', 'fr'])
                      for _ in texts], pa.string()),
    'source': pa.array([f's{rng.randint(0, 3)}' for _ in texts],
                       pa.string()),
    'n_chars': pa.array([len(t) for t in texts], pa.int64()),
})
pq.write_table(docs, f'{dst}/documents.parquet')

vecs = []
for i in range(64):
    v = [rng.uniform(-2, 2) for _ in range(64)]
    vecs.append([float(pa.scalar(x, pa.float32()).as_py()) for x in v])
for i in range(0, 12, 3):  # planted duplicate vectors
    vecs[i + 1] = vecs[i]
emb = pa.table({
    'vec_id': pa.array(range(64), pa.int64()),
    'embedding': pa.array(vecs, pa.list_(pa.float32())),
    'label': pa.array([i % 4 for i in range(64)], pa.int32()),
})
pq.write_table(emb, f'{dst}/embeddings.parquet')
print(f'seed {seed}: wrote {len(texts)} docs, 64 vectors to {dst}')
