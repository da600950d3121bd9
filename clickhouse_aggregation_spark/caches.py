"""Session plan-cache administration.

Several operator families materialize a "build once, consume many
times" plan per (applicationId, sf_dir) — shingle sets, confirmed
MinHash / banded-LSH pair tables, the IVF corpus assignment, the
contamination hash table, and the streaming façades' maintained
stores. Each is a MEMORY_AND_DISK-persisted DataFrame (or a temp
store directory) pinned for the application's lifetime.

That is the right default for a query session (an index is built once
and searched many times), but a multi-scale bench loop (sf0.1 → sf0.5
→ sf1.0 in ONE process) pins every scale's copy simultaneously —
executor storage memory then competes with shuffle for the rest of
the run (ADVICE r4). ``clear_plan_caches`` is the explicit eviction
point: call it between scale runs (bench.py does) or whenever a
sf_dir's plans are known dead.

Eviction note (VERDICT r6 carried item): the per-cache dicts are
UNBOUNDED in (session, sf_dir) — fine for a bench/test process that
touches a handful of scale dirs, but a long-lived multi-tenant session
serving many datasets should call ``clear_plan_caches(sf_dir)`` when a
dataset is retired, or wrap these dicts with an LRU if dataset churn
is unbounded. Entries hold MEMORY_AND_DISK persisted frames, so the
cost of an unevicted entry is bounded by the disk store, not the heap.
"""

from __future__ import annotations

import os
import shutil


def clear_plan_caches(sf_dir: str | None = None) -> dict[str, int]:
    """Unpersist and drop every session plan cache entry (optionally
    only those built for ``sf_dir``). Returns {cache_name: n_evicted}.

    Safe at any point: consumers re-build lazily on next use — eviction
    trades the next warm hit for released storage memory, never
    correctness. Maintained streaming stores are temp DIRECTORIES, not
    persisted plans; their entries are dropped (and the dirs removed)
    so a re-run re-drives the stream against the same deterministic
    chunking.
    """
    from .operators import (clustering, contamination, curation, dedup,
                            similarity, streaming_bridge, text)

    evicted: dict[str, int] = {}

    def _match(key) -> bool:
        # cache keys are (applicationId, sf_dir) or (kind, appId, sf_dir)
        return sf_dir is None or key[-1] == sf_dir

    for name, cache in (
        ("dedup_sets", dedup._SETS_CACHE),
        ("minhash_pairs", dedup._PAIRS_CACHE),
        ("banded_pairs", dedup._BANDED_CACHE),
        ("cosine_base", dedup._COSINE_BASE_CACHE),
        ("banded_capped", dedup._BANDED_CAPPED_CACHE),
        ("ivf_corpus", similarity._IVF_CORPUS_CACHE),
        ("sem_corpus", similarity._SEM_CORPUS_CACHE),
        ("eval_topk", similarity._EVAL_TOPK_CACHE),
        ("contamination_hashes", contamination._HASH_CACHE),
        ("curation_annotated", curation._ANN_CACHE),
        ("pagerank_edges", clustering._PR_EDGES_CACHE),
        ("pagerank_nodes", clustering._PR_NODES_CACHE),
        ("bpe_vocab", text._VOCAB_CACHE),
    ):
        hit = [k for k in cache if _match(k)]
        for k in hit:
            df = cache.pop(k)
            try:
                df.unpersist()
            except Exception:  # session already stopped — nothing pinned
                pass
        evicted[name] = len(hit)

    # scalar memos that ride along with the frame caches (no unpersist)
    for name, memo in (("sem_k", similarity._SEM_K_CACHE),):
        hit = [k for k in memo if _match(k)]
        for k in hit:
            memo.pop(k)
        evicted[name] = len(hit)

    hit = [k for k in streaming_bridge._STORE_CACHE if _match(k)]
    for k in hit:
        store = streaming_bridge._STORE_CACHE.pop(k)
        # the store lives under a private temp root that also holds the
        # chunked source; drop the whole root
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    evicted["maintained_stores"] = len(hit)
    return evicted
