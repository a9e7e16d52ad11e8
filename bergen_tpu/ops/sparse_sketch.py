"""SPLADE sparse MIPS via count-sketch + exact on-device rescoring.

The round-2 SPLADE path (``ops/sparse.py``: scatter-densify 4096-doc blocks
to [B, 30522] and run a dense GEMM) is *exact* but pays the full dense-vocab
GEMM: 512 queries x 30522 x 1M docs of bf16 MXU work plus the scatter — the
one workload that lost to the modeled GPU baseline (~590 QPS vs ~8k
cuSPARSE-A100, round-2 performance.md).  A host MaxScore/WAND engine cannot
close the gap either: this box has ONE CPU core and published SPLADE
MaxScore latencies are ~ms/query — a few hundred QPS ceiling.

The TPU-native answer keeps the irregular work off the hot path entirely:

1. **Count-sketch projection** (offline, host, cached): every vocab term maps
   to one of ``d`` buckets with a random sign; a doc's sketch is the signed
   sum of its term weights per bucket.  Inner products are preserved in
   expectation (AMS/count-sketch estimator): E[s(q)·s(x)] = q·x with
   variance ~ ||q||²||x||²/d.  The sketch is a *dense d-dim embedding*, so
   stage 1 rides the existing fused int8 GEMM + bin-argmax kernel
   (``ops/fused_topk``) — the 193k-QPS path — to produce top-C candidates
   per mesh shard.
2. **Exact rescoring on device**: the C candidates' fixed-width (val, idx)
   rows are row-gathered from the shard-resident sparse corpus and scored
   exactly as ``sum_j val_j * q_dense[idx_j]`` (vectorised VMEM gathers),
   so the final ranking *within the candidate set* is exact sparse math.
3. **ICI merge on exact scores**: per-shard exact top-k all-gathered and
   merged — recall is lost only when a true top-k doc falls outside its own
   shard's sketch top-C, which the pipeline's recall guard measures on every
   run (``pipeline/retrieve.py``) and repairs by falling back to the exact
   densify path.

Replaces the hot path of reference ``models/retrievers/splade.py:55-56`` +
``modules/retrieve.py:154`` (torch.sparse.mm over streamed chunks).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bergen_tpu.ops import fused_topk
from bergen_tpu.ops.scoring import quantize_rows_int8


def sketch_map(vocab: int, d: int, seed: int = 0,
               term_mass: np.ndarray | None = None,
               head_frac: float = 0.5, tail_assign: str = "random"):
    """Sketch hash: (bucket [vocab] int32, sign [vocab] f32).

    With ``term_mass`` (corpus impact mass per term, sum_docs |val|), the map
    is *frequency-partitioned*: the ``head_frac * d`` highest-mass terms each
    get a DEDICATED bucket (sign +1, zero collision — their inner-product
    contribution is exact), and only the mass-poor tail is count-sketch-hashed
    into the remaining buckets.  Collision variance scales with the product of
    colliding terms' impact masses, so dedicating buckets to the heaviest
    terms removes most of it at the same sketch width — the estimator stays
    unbiased (head exact + AMS tail).  Without ``term_mass`` this degrades to
    the classic uniform count-sketch.

    ``head_frac`` trades head exactness against tail collision density
    (d_tail = (1-head_frac)*d shrinks as the head grows).  On Zipf-like
    impact mass (s~0.9, SPLADE-shaped synthetic, d=512) recall@10 of the
    stage-1 candidates peaks near head_frac 0.375-0.5 (+6.6 pts over the
    uniform sketch) and falls below uniform past ~0.6 — keep it <= 0.5."""
    rng = np.random.default_rng(seed)
    if term_mass is None:
        bucket = rng.integers(0, d, vocab).astype(np.int32)
        sign = rng.choice(np.asarray([-1.0, 1.0], np.float32), vocab)
        return bucket, sign
    d_head = min(int(d * head_frac), vocab)
    d_tail = d - d_head
    assert d_tail >= 1, "head_frac leaves no tail buckets"
    order = np.argsort(-np.asarray(term_mass, np.float64), kind="stable")
    bucket = np.empty(vocab, np.int32)
    sign = np.empty(vocab, np.float32)
    head = order[:d_head]
    tail = order[d_head:]
    bucket[head] = np.arange(d_head, dtype=np.int32)
    sign[head] = 1.0
    if tail_assign == "balanced":
        # mass-balanced round-robin: tail terms sorted by mass spread evenly,
        # so no bucket accumulates several heavy terms — strictly lower max
        # collision product than random hashing at the same width (the heavy
        # terms are exactly the likely collision noise sources)
        bucket[tail] = d_head + (
            np.arange(tail.size, dtype=np.int32) % d_tail
        )
    else:
        bucket[tail] = d_head + rng.integers(
            0, d_tail, tail.size
        ).astype(np.int32)
    sign[tail] = rng.choice(np.asarray([-1.0, 1.0], np.float32), tail.size)
    return bucket, sign


def term_impact_mass(vals: np.ndarray, idx: np.ndarray, vocab: int
                     ) -> np.ndarray:
    """Corpus impact mass per vocab term: sum over postings of |val|."""
    return np.bincount(
        idx.ravel().astype(np.int64),
        weights=np.abs(vals.astype(np.float64)).ravel(),
        minlength=vocab,
    )


def sketch_docs(vals: np.ndarray, idx: np.ndarray, bucket: np.ndarray,
                sign: np.ndarray, d: int) -> np.ndarray:
    """Fixed-width sparse docs [N, nnz] -> dense sketches [N, d] f32.

    Vectorised via a COO->CSR matmul-free accumulation (np.add.at is ~20x
    too slow at 256M postings)."""
    from scipy import sparse as sp

    N, nnz = vals.shape
    rows = np.repeat(np.arange(N, dtype=np.int64), nnz)
    cols = bucket[idx.ravel()].astype(np.int64)
    data = vals.astype(np.float32).ravel() * sign[idx.ravel()]
    m = sp.coo_matrix((data, (rows, cols)), shape=(N, d))
    return np.asarray(m.tocsr().todense(), dtype=np.float32)


def sketch_queries(q_dense: np.ndarray, bucket: np.ndarray, sign: np.ndarray,
                   d: int) -> np.ndarray:
    """Dense [Q, V] queries -> [Q, d] sketches (same map as the docs)."""
    from scipy import sparse as sp

    V = q_dense.shape[1]
    S = sp.csr_matrix(
        (sign, (np.arange(V, dtype=np.int64), bucket.astype(np.int64))),
        shape=(V, d),
    )
    return np.asarray(q_dense.astype(np.float32) @ S)


# --------------------------------------------------------------------------- #
# device path: per-shard sketch top-C -> exact rescoring -> ICI merge
# --------------------------------------------------------------------------- #


def _rescore_local(q_dense, cand, vals_shard, idx_shard, q_block: int):
    """Exact sparse scores for per-query candidate lists.

    q_dense [Q, V], cand [Q, C] local row ids -> [Q, C] f32 exact scores.
    Scanned over query blocks to bound the [qb, C, nnz] gather transients.
    """
    Q, C = cand.shape
    qb = min(q_block, Q)
    pad = (-Q) % qb
    qd = jnp.pad(q_dense, ((0, pad), (0, 0)))
    cd = jnp.pad(cand, ((0, pad), (0, 0)))

    def body(_, args):
        qrows, crows = args  # [qb, V], [qb, C]
        cv = jnp.take(vals_shard, crows, axis=0)        # [qb, C, nnz]
        ci = jnp.take(idx_shard, crows, axis=0)         # [qb, C, nnz]
        qg = jax.vmap(lambda qr, ix: qr[ix])(qrows, ci)  # [qb, C, nnz]
        s = jnp.sum(qg * cv.astype(jnp.float32), axis=-1)
        return None, s

    _, scores = jax.lax.scan(
        body, None,
        (qd.reshape(-1, qb, qd.shape[1]), cd.reshape(-1, qb, C)),
    )
    return scores.reshape(-1, C)[:Q]


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh: Mesh, k: int, cand: int, q_block: int, interpret: bool):
    def local(q_sketch_i8, q_dense, sk_shard, sk_scales, vals_shard,
              idx_shard, valid_n):
        shard_n = sk_shard.shape[0]
        di = jax.lax.axis_index("data")
        offset = di * shard_n
        local_valid = jnp.clip(valid_n - offset, 0, shard_n)
        # stage 1: fused int8 GEMM + bin-argmax over the sketch shard
        cv1, cidx = fused_topk.bin_topk(
            q_sketch_i8, sk_shard, cand, valid_n=local_valid,
            doc_scales=sk_scales, interpret=interpret,
        )
        # masked/padded candidate slots come back -inf; their idx values are
        # meaningless (and can repeat row 0 — a duplicate-doc hazard), so
        # carry the mask through to the rescored scores
        cand_ok = cv1 > -jnp.inf
        cidx = jnp.clip(cidx, 0, shard_n - 1)
        # stage 2: exact sparse rescoring of the candidates
        s = _rescore_local(q_dense, cidx, vals_shard, idx_shard, q_block)
        gid = cidx + offset
        s = jnp.where(cand_ok & (gid < valid_n), s, -jnp.inf)
        k_eff = min(k, cand)
        v, i = jax.lax.top_k(s, k_eff)
        gi = jnp.take_along_axis(gid, i, axis=1)
        # stage 3: exact-score merge over ICI
        av = jax.lax.all_gather(v, "data", axis=0)
        ai = jax.lax.all_gather(gi, "data", axis=0)
        av = jnp.swapaxes(av, 0, 1).reshape(v.shape[0], -1)
        ai = jnp.swapaxes(ai, 0, 1).reshape(v.shape[0], -1)
        mv, mi = jax.lax.top_k(av, min(k, av.shape[1]))
        return mv, jnp.take_along_axis(ai, mi, axis=1)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P("data", None), P("data"), P("data", None),
                  P("data", None), P()),
        out_specs=(P(), P()), check_vma=False,
    )
    return jax.jit(fn)


class SketchIndex:
    """Device-resident SPLADE corpus: int8 sketch shards (stage 1) + the
    fixed-width sparse rows (stage 2), both over the mesh 'data' axis."""

    def __init__(self, mesh: Mesh, vals: np.ndarray, idx: np.ndarray,
                 vocab: int, d: int = 1024, candidates: int = 512,
                 seed: int = 0, cache_path: str | None = None,
                 vals_dev=None, idx_dev=None, head_frac: float = 0.5):
        self.mesh = mesh
        self.vocab = vocab
        self.d = d
        self.candidates = candidates
        N, nnz = vals.shape
        self.valid_n = N
        mass = term_impact_mass(vals, idx, vocab) if head_frac > 0 else None
        self.bucket, self.sign = sketch_map(
            vocab, d, seed, term_mass=mass, head_frac=head_frac
        )
        # cache key must bind the sketch to its MAP: doc sketches built under
        # a different (bucket, sign) — e.g. a pre-partitioning cache, or a
        # different head_frac — score garbage against this map's query
        # sketches while passing the shape check
        map_tag = int(np.uint64(
            np.bitwise_xor.reduce(self.bucket.view(np.uint32).astype(np.uint64)
                                  * np.uint64(0x9E3779B97F4A7C15))
            ^ np.uint64((self.sign < 0).sum())
        ))

        sk = None
        if cache_path is not None:
            import os

            cache_path = cache_path.replace(".npy", f"_{map_tag:016x}.npy")
            if os.path.exists(cache_path):
                sk = np.load(cache_path)
                if sk.shape != (N, d):
                    sk = None
        if sk is None:
            sk = sketch_docs(vals, idx, self.bucket, self.sign, d)
            if cache_path is not None:
                np.save(cache_path, sk)

        # stage-1 sketch shards through the fused kernel's int8 row layout
        (self.sk_dev, self.sk_scales, _per_doc, _n) = (
            fused_topk.shard_corpus_rows(mesh, sk, jnp.int8)
        )
        # stage-2 sparse rows, padded to the same row count as the sketch
        # shards so local candidate ids line up.  Callers that already hold
        # the corpus on device (ops.sparse.shard_sparse_corpus pads to the
        # same bin granularity) pass it in to avoid a duplicate copy.
        Np = self.sk_dev.shape[0]
        if (vals_dev is not None and idx_dev is not None
                and vals_dev.shape[0] == Np):
            self.vals_dev, self.idx_dev = vals_dev, idx_dev
        else:
            if Np != N:
                vals = np.pad(vals, ((0, Np - N), (0, 0)))
                idx = np.pad(idx, ((0, Np - N), (0, 0)))
            sh = NamedSharding(mesh, P("data", None))
            self.vals_dev = jax.device_put(jnp.asarray(vals, jnp.bfloat16), sh)
            self.idx_dev = jax.device_put(jnp.asarray(idx, jnp.int32), sh)

    def search(self, q_dense: np.ndarray, k: int, q_block: int = 128,
               interpret: bool | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """[Q, V] dense queries -> exact-rescored ([Q, k] scores, ids)."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        qs = sketch_queries(q_dense, self.bucket, self.sign, self.d)
        q_i8, q_scale = quantize_rows_int8(jnp.asarray(qs, jnp.float32))
        n_data = self.mesh.shape["data"]
        cand = max(k, min(self.candidates, self.sk_dev.shape[0] // n_data))
        fn = _sharded_fn(self.mesh, k, cand, q_block, interpret)
        return fn(
            q_i8, jnp.asarray(q_dense, jnp.float32), self.sk_dev,
            self.sk_scales, self.vals_dev, self.idx_dev,
            jnp.int32(self.valid_n),
        )
