#!/usr/bin/env python3
"""sf1 scale-probe fixture generator (round-8 task; driver-side tooling
only, like check_oracle.py — duckdb/pyarrow are NOT library deps).

Generates a 100x-sf0.1 corpus with REALISTIC duplicate density — unlike
the worst-case 10-clique synthetic probe of round 7 — so constant
factors, not just asymptotics, are measured:

  documents.parquet   500,000 docs, zipf-ish vocab, ~45 tokens/doc;
                      ~3%% of docs are near-dups (clusters of 2-4 with
                      small token perturbations), ~0.5%% exact dups
  embeddings.parquet  200,000 x 64-dim float vectors, 10 labels;
                      ~2%% planted near-neighbors (small gaussian nudge)

Deterministic (fixed seed). Usage:
    python3 tools/gen_sf1.py [outdir]   # default /tmp/graft_sf1
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
N_DOCS = 500_000
N_VECS = 200_000
DIM = 64
SEED = 8


def gen_documents():
    rng = random.Random(SEED)
    # random-letter vocab, not "w<i>": byte-TRIGRAM diversity must look
    # like real text — a digits-only vocab collapses the multimodal
    # operator's 2^24-dim trigram space to a few hundred live dims and
    # every "rare" dim stops being rare (measured: mm_near_dup candidate
    # blowup on the wN vocab, normal behavior on this one)
    letters = "abcdefghijklmnopqrstuvwxyz"
    vocab = [
        "".join(rng.choice(letters) for _ in range(rng.randint(3, 10)))
        for _ in range(30_000)
    ]
    # zipf-ish sampling: low ids much more frequent
    def tok():
        r = rng.random()
        idx = int((len(vocab) - 1) * r * r * r)
        return vocab[idx]

    docs = []  # (doc_id, text, lang, source, n_chars)
    doc_id = 0
    while doc_id < N_DOCS:
        n = rng.randint(25, 65)
        words = [tok() for _ in range(n)]
        text = " ".join(words)
        src = f"src{rng.randint(0, 19)}"
        lang = rng.choice(["en", "en", "en", "de", "fr"])
        docs.append((doc_id, text, lang, src, len(text)))
        doc_id += 1
        # ~3% of ids start a near-dup cluster of 2-4 members; ~0.5% exact
        r = rng.random()
        if r < 0.03 and doc_id < N_DOCS:
            for _ in range(rng.randint(1, 3)):
                if doc_id >= N_DOCS:
                    break
                mutated = list(words)
                for _ in range(rng.randint(1, 3)):  # light perturbation
                    mutated[rng.randrange(len(mutated))] = tok()
                t2 = " ".join(mutated)
                docs.append((doc_id, t2, lang, src, len(t2)))
                doc_id += 1
        elif r < 0.035 and doc_id < N_DOCS:
            docs.append((doc_id, text, lang, src, len(text)))
            doc_id += 1

    cols = list(zip(*docs))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, f"{OUT}/documents.parquet")
    print(f"documents: {table.num_rows} rows")


def gen_embeddings():
    rng = random.Random(SEED + 1)
    ids, vecs, labels = [], [], []
    vec_id = 0
    while vec_id < N_VECS:
        base = [rng.gauss(0.0, 1.0) for _ in range(DIM)]
        label = rng.randint(0, 9)
        ids.append(vec_id)
        vecs.append([float(f"{x:.4f}") for x in base])
        labels.append(label)
        vec_id += 1
        if rng.random() < 0.02 and vec_id < N_VECS:  # planted near-neighbor
            nudged = [x + rng.gauss(0.0, 0.02) for x in base]
            ids.append(vec_id)
            vecs.append([float(f"{x:.4f}") for x in nudged])
            labels.append(label)
            vec_id += 1

    table = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {table.num_rows} rows")


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_documents()
    gen_embeddings()
    print(f"wrote {OUT}")
