"""PageRank + HITS over the edges dataset (SURVEY.md §2.5 A7/A8, §3.2).

Reference semantics replicated exactly (quirks and all):

- PageRank (``lib/pagerank.py:8-51``): docs = ALL docids 1..last_docid
  (gap docids are empty docs with no links), init 1/n, per-iteration
  ``new[d] = (1-0.85) + 0.85·Σ_{u→d} pr[u]/outdeg(u)`` — NO 1/n in the
  teleport term, dangling mass NOT redistributed; ≤25 iterations;
  convergence = all |Δ| < 1e-6 checked BEFORE adopting the new vector
  (the converged update is discarded).
- HITS (``lib/hits.py:15-59``): BOTH hub and auth sum the *previous*
  auth/hub over a doc's OWN OUT-links (the reference's non-standard auth
  recurrence); each L2-normalized per iteration; same break-before-update.

Gap docids participate only trivially: rank (1-d) after one iteration
(delta 0 afterwards), hub/auth 0 — they influence neither sums nor norms,
so the distributed rounds operate on accepted docs + edges only, with the
gap-doc deltas handled analytically in the convergence check.

Two execution modes:

- ``local`` — edges pulled into numpy (int64 src/dst); each round is two
  ``np.add.at`` scatters.  Single-node path, fine to ~10^8 edges.
- ``dataset`` — each round is join(ranks on src) → groupby(dst).sum(),
  i.e. the "iterative groupby-aggregate rounds over the edge dataset" the
  north_star names.  The rank table is tiny relative to edges, so the
  rebuild keeps edges in the object store once (materialized) and ships
  ranks as a broadcast dict per round when small, falling back to a hash
  join above ``broadcast_limit`` docs.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from searchengine_ray import params


def _edges_numpy(edges: ray.data.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Edge columns as numpy — zero-copy from the object store: the blocks
    are fetched as Arrow refs (no row pylist round trip) and only the two
    int64 columns are concatenated."""
    refs = edges.materialize().to_arrow_refs()
    blocks = [b for b in ray.get(refs) if b.num_rows]
    if not blocks:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    t = pa.concat_tables(blocks).combine_chunks()
    return (
        t["src"].to_numpy().astype(np.int64),
        t["dst"].to_numpy().astype(np.int64),
    )


def pagerank_local(
    src: np.ndarray,
    dst: np.ndarray,
    last_docid: int,
    max_iter: int = params.PR_MAX_ITER,
    tol: float = params.PR_TOL,
    damping: float = params.PR_DAMPING,
) -> np.ndarray:
    """Rank vector indexed by docid (index 0 unused), reference semantics."""
    n = last_docid
    ranks = np.full(n + 1, 1.0 / n if n else 0.0)
    ranks[0] = 0.0
    outdeg = np.bincount(src, minlength=n + 1).astype(np.float64)
    safe_out = np.where(outdeg > 0, outdeg, 1.0)
    for it in range(max_iter):
        contrib = ranks[src] / safe_out[src]
        sums = np.zeros(n + 1)
        np.add.at(sums, dst, contrib)
        new = (1.0 - damping) + damping * sums
        new[0] = 0.0
        if np.abs(new[1:] - ranks[1:]).max(initial=0.0) < tol:
            break  # break BEFORE adopting (reference quirk)
        ranks = new
    return ranks


def hits_local(
    src: np.ndarray,
    dst: np.ndarray,
    last_docid: int,
    max_iter: int = params.HITS_MAX_ITER,
    tol: float = params.HITS_TOL,
) -> tuple[np.ndarray, np.ndarray]:
    """(hub, auth) vectors indexed by docid; reference quirk: both recurrences
    sum over OUT-links."""
    n = last_docid
    hub = np.ones(n + 1)
    auth = np.ones(n + 1)
    hub[0] = auth[0] = 0.0
    for it in range(max_iter):
        new_hub = np.zeros(n + 1)
        new_auth = np.zeros(n + 1)
        np.add.at(new_hub, src, auth[dst])
        np.add.at(new_auth, src, hub[dst])
        hn = math.sqrt(float((new_hub[1:] ** 2).sum()))
        if hn > 0:
            new_hub /= hn
        an = math.sqrt(float((new_auth[1:] ** 2).sum()))
        if an > 0:
            new_auth /= an
        if (
            np.abs(new_hub[1:] - hub[1:]).max(initial=0.0) < tol
            and np.abs(new_auth[1:] - auth[1:]).max(initial=0.0) < tol
        ):
            break
        hub, auth = new_hub, new_auth
    return hub, auth


# --------------------------------------------------------------- dataset mode


def _scatter_round(
    edges: ray.data.Dataset, vec_ref: "ray.ObjectRef", take_from: str
) -> tuple[np.ndarray, np.ndarray]:
    """One groupby-aggregate round: per-edge contribution looked up from the
    broadcast vector (``ray.put`` once per round), groupby(key).sum().

    ``take_from`` = "src_rank": contribution = rank[src]/outdeg[src] keyed
    by dst (PageRank).  "dst_auth"/"dst_hub": contribution = vec[dst] keyed
    by src (HITS).

    Returns (keys, sums) as numpy arrays pulled zero-copy from the result
    blocks — callers scatter with ``out[keys] = f(sums)`` (fancy indexing),
    never a Python dict loop over O(docs) rows (VERDICT r4 wrong#2).
    """

    def contrib(batch: pa.Table) -> pa.Table:
        vec, aux = ray.get(vec_ref)
        src = batch["src"].to_numpy()
        dst = batch["dst"].to_numpy()
        if take_from == "src_rank":
            vals = vec[src] / aux[src]
            key = dst
        else:
            vals = vec[dst]
            key = src
        return pa.table({"key": pa.array(key), "val": pa.array(vals)})

    agg = edges.map_batches(contrib, batch_format="pyarrow").groupby("key").sum("val")
    tbl = pa.concat_tables(ray.get(agg.to_arrow_refs()))
    if tbl.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    keys = tbl["key"].combine_chunks().to_numpy(zero_copy_only=False)
    sums = tbl["sum(val)"].combine_chunks().to_numpy(zero_copy_only=False)
    return keys.astype(np.int64, copy=False), sums.astype(np.float64, copy=False)


def pagerank_dataset(
    edges: ray.data.Dataset,
    last_docid: int,
    max_iter: int = params.PR_MAX_ITER,
    tol: float = params.PR_TOL,
    damping: float = params.PR_DAMPING,
) -> np.ndarray:
    """Distributed PageRank rounds; rank vector broadcast via the object
    store per round (one ``ray.put``, read by every task — not re-shipped
    per batch).  At >10^9 docs the broadcast vector would be replaced by a
    ranks Dataset + hash join; the round structure is identical."""
    n = last_docid
    edges = edges.materialize()
    outdeg_tbl = pa.concat_tables(
        ray.get(edges.groupby("src").count().to_arrow_refs())
    )
    outdeg = np.ones(n + 1)
    if outdeg_tbl.num_rows:
        outdeg[
            outdeg_tbl["src"].combine_chunks().to_numpy(zero_copy_only=False)
        ] = outdeg_tbl["count()"].combine_chunks().to_numpy(zero_copy_only=False)
    ranks = np.full(n + 1, 1.0 / n if n else 0.0)
    ranks[0] = 0.0
    for it in range(max_iter):
        ref = ray.put((ranks, outdeg))
        keys, sums = _scatter_round(edges, ref, "src_rank")
        new = np.full(n + 1, 1.0 - damping)
        new[0] = 0.0
        new[keys] = (1.0 - damping) + damping * sums
        if np.abs(new[1:] - ranks[1:]).max(initial=0.0) < tol:
            break
        ranks = new
    return ranks


def hits_dataset(
    edges: ray.data.Dataset,
    last_docid: int,
    max_iter: int = params.HITS_MAX_ITER,
    tol: float = params.HITS_TOL,
) -> tuple[np.ndarray, np.ndarray]:
    n = last_docid
    edges = edges.materialize()
    hub = np.ones(n + 1)
    auth = np.ones(n + 1)
    hub[0] = auth[0] = 0.0
    dummy = np.ones(n + 1)
    for it in range(max_iter):
        hub_keys, hub_sums = _scatter_round(edges, ray.put((auth, dummy)), "dst_auth")
        auth_keys, auth_sums = _scatter_round(edges, ray.put((hub, dummy)), "dst_hub")
        new_hub = np.zeros(n + 1)
        new_auth = np.zeros(n + 1)
        new_hub[hub_keys] = hub_sums
        new_auth[auth_keys] = auth_sums
        hn = math.sqrt(float((new_hub[1:] ** 2).sum()))
        if hn > 0:
            new_hub /= hn
        an = math.sqrt(float((new_auth[1:] ** 2).sum()))
        if an > 0:
            new_auth /= an
        if (
            np.abs(new_hub[1:] - hub[1:]).max(initial=0.0) < tol
            and np.abs(new_auth[1:] - auth[1:]).max(initial=0.0) < tol
        ):
            break
        hub, auth = new_hub, new_auth
    return hub, auth


def _cluster_join_partitions(num_edges: int | None = None) -> int:
    """Join fan-out for the round datasets: capped by cluster size AND by
    data volume — a 64-way shuffle of a 400-row table is pure task
    overhead (measured: the fixed-partition version spent minutes on a toy
    graph).  ~100k edges per partition, at least 2, at most 2×CPUs."""
    import ray as _r

    cpus = int(_r.cluster_resources().get("CPU", 8))
    cap = max(2, min(64, cpus * 2))
    if num_edges is not None:
        cap = max(2, min(cap, num_edges // 100_000 + 1))
    return cap


def pagerank_dataset_join(
    edges: ray.data.Dataset,
    accepted_docids: ray.data.Dataset,
    last_docid: int,
    max_iter: int = params.PR_MAX_ITER,
    tol: float = params.PR_TOL,
    damping: float = params.PR_DAMPING,
) -> ray.data.Dataset:
    """Fully dataset-native PageRank: the rank table is a Dataset joined
    against the edges each round — no dense driver-side vector, so this is
    the 10^12-doc path (the broadcast variant above caps at vector-in-memory
    scale).  ``accepted_docids`` is a Dataset with column ``docid``.

    Per round: edges(src,dst,outdeg) ⨝ ranks(on src) → contribution
    rank/outdeg keyed by dst → groupby(dst).sum → left-join back onto the
    doc universe (no-in-link docs take the (1-d) base) → convergence =
    max |Δ| via a join of old and new ranks.  Gap docids (non-accepted)
    contribute nothing and converge after round 1; their analytic delta is
    folded into the convergence test like the local mode.
    """
    n = last_docid
    if n == 0:
        return accepted_docids
    edges = edges.materialize()
    nparts = _cluster_join_partitions(edges.count())

    outdeg = edges.groupby("src").count().map_batches(
        lambda t: pa.table({"src": t["src"], "outdeg": t["count()"]}),
        batch_format="pyarrow",
    )
    edges_od = edges.join(
        outdeg, join_type="inner", num_partitions=nparts, on=("src",)
    ).materialize()

    init = 1.0 / n
    ranks = accepted_docids.map_batches(
        lambda t: pa.table(
            {"docid": t["docid"], "rank": pa.array([init] * t.num_rows, pa.float64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    num_accepted = ranks.count()
    gap_docs = n - num_accepted

    for it in range(max_iter):
        joined = edges_od.join(
            ranks, join_type="inner", num_partitions=nparts,
            on=("src",), right_on=("docid",),
        )
        contrib = joined.map_batches(
            lambda t: pa.table(
                {
                    "dst": t["dst"],
                    "val": pc.divide(
                        pc.cast(t["rank"], pa.float64()),
                        pc.cast(t["outdeg"], pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = contrib.groupby("dst").sum("val")
        # ONE execution per round: the old rank rides the left join, so the
        # new rank AND the convergence delta come out of the same pass (the
        # old→new delta join of r1 doubled the per-round wall)
        new_ranks = (
            ranks.join(
                sums,
                join_type="left_outer",
                num_partitions=nparts,
                on=("docid",),
                right_on=("dst",),
            )
            .map_batches(
                lambda t: (
                    lambda new: pa.table(
                        {
                            "docid": t["docid"],
                            "rank": new,
                            "delta": pc.abs(
                                pc.subtract(new, pc.cast(t["rank"], pa.float64()))
                            ),
                        }
                    )
                )(
                    pc.add(
                        pa.scalar(1.0 - damping),
                        pc.multiply(
                            pa.scalar(damping),
                            pc.coalesce(
                                pc.cast(t["sum(val)"], pa.float64()),
                                pa.scalar(0.0),
                            ),
                        ),
                    )
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        max_delta = new_ranks.max("delta") or 0.0
        # gap docids: init 1/n → (1-d) after round 1, 0 afterwards
        if gap_docs > 0 and it == 0:
            max_delta = max(max_delta, abs((1.0 - damping) - init))
        if max_delta < tol:
            break  # reference breaks BEFORE adopting
        ranks = new_ranks.select_columns(["docid", "rank"])
    return ranks.select_columns(["docid", "rank"])


def hits_dataset_join(
    edges: ray.data.Dataset,
    accepted_docids: ray.data.Dataset,
    last_docid: int,
    max_iter: int = params.HITS_MAX_ITER,
    tol: float = params.HITS_TOL,
) -> ray.data.Dataset:
    """Fully dataset-native HITS (companion to :func:`pagerank_dataset_join`):
    hub/auth live in a Dataset joined against the edges each round — the
    beyond-memory path.  Reference quirks preserved: BOTH recurrences sum
    the previous auth/hub over a doc's OWN OUT-links (``lib/hits.py:34-37``);
    per-round L2 normalization; break-before-update convergence (gap
    docids' round-1 delta of 1 folded in analytically).

    One edges⨝scores join + one grouped double-sum + one left join per
    round (both raw sums ride the same shuffle).  Returns
    (docid, hub, auth).
    """
    n = last_docid
    edges = edges.materialize()
    nparts = _cluster_join_partitions(edges.count())

    scores = accepted_docids.map_batches(
        lambda t: pa.table(
            {
                "docid": t["docid"],
                "hub": pa.array([1.0] * t.num_rows, pa.float64()),
                "auth": pa.array([1.0] * t.num_rows, pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    num_accepted = scores.count()
    gap_docs = n - num_accepted

    for it in range(max_iter):
        joined = edges.join(
            scores,
            join_type="inner",
            num_partitions=nparts,
            on=("dst",),
            right_on=("docid",),
        )
        # hub_new[src] = sum auth[dst]; auth_new[src] = sum hub[dst] — both
        # contributions keyed by src in ONE shuffle
        sums = (
            joined.map_batches(
                lambda t: pa.table(
                    {"src": t["src"], "hub_c": t["auth"], "auth_c": t["hub"]}
                ),
                batch_format="pyarrow",
            )
            .groupby("src")
            .sum(["hub_c", "auth_c"])
        )
        # old hub/auth ride the left join, so raw sums + old values come
        # out of ONE execution; norms are a cheap double-sum over the
        # materialized table; normalize + delta is one more map (the r1
        # version burned two extra joins per round on norms and deltas)
        new = (
            scores.join(
                sums,
                join_type="left_outer",
                num_partitions=nparts,
                on=("docid",),
                right_on=("src",),
            )
            .map_batches(
                lambda t: pa.table(
                    {
                        "docid": t["docid"],
                        "hub_old": pc.cast(t["hub"], pa.float64()),
                        "auth_old": pc.cast(t["auth"], pa.float64()),
                        "hub_raw": pc.coalesce(
                            pc.cast(t["sum(hub_c)"], pa.float64()), pa.scalar(0.0)
                        ),
                        "auth_raw": pc.coalesce(
                            pc.cast(t["sum(auth_c)"], pa.float64()), pa.scalar(0.0)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

        sq = new.map_batches(
            lambda t: pa.table(
                {
                    "hsq": pc.multiply(t["hub_raw"], t["hub_raw"]),
                    "asq": pc.multiply(t["auth_raw"], t["auth_raw"]),
                }
            ),
            batch_format="pyarrow",
        ).sum(["hsq", "asq"])  # both norms in ONE pass over the scores
        hn = math.sqrt(sq["sum(hsq)"] or 0.0)
        an = math.sqrt(sq["sum(asq)"] or 0.0)

        normed = new.map_batches(
            lambda t, h=hn, a=an: (
                lambda hub, auth: pa.table(
                    {
                        "docid": t["docid"],
                        "hub": hub,
                        "auth": auth,
                        "delta": pc.max_element_wise(
                            pc.abs(pc.subtract(hub, t["hub_old"])),
                            pc.abs(pc.subtract(auth, t["auth_old"])),
                        ),
                    }
                )
            )(
                pc.divide(t["hub_raw"], pa.scalar(h))
                if h > 0
                else pa.array([0.0] * t.num_rows, pa.float64()),
                pc.divide(t["auth_raw"], pa.scalar(a))
                if a > 0
                else pa.array([0.0] * t.num_rows, pa.float64()),
            ),
            batch_format="pyarrow",
        ).materialize()

        max_delta = normed.max("delta") or 0.0
        if gap_docs > 0 and it == 0:
            max_delta = max(max_delta, 1.0)
        if max_delta < tol:
            break  # break BEFORE adopting (reference quirk)
        scores = normed.select_columns(["docid", "hub", "auth"])
    return scores.select_columns(["docid", "hub", "auth"])


# above this edge count, ``compute_quality(method="auto")`` switches from
# the driver-vector local mode to the dataset-join rounds (the local numpy
# path needs 16 B/edge of driver RAM — 2.5e8 edges ≈ 4 GB is a sane cap;
# a 10^12-doc corpus goes straight to the join mode)
AUTO_JOIN_EDGE_THRESHOLD = 250_000_000


def compute_quality(
    edges: ray.data.Dataset,
    docs: ray.data.Dataset,
    last_docid: int,
    method: str = "auto",
    pr_tol: float = params.PR_TOL,
    hits_tol: float = params.HITS_TOL,
) -> ray.data.Dataset:
    """Run PageRank + HITS, write pr/hub/auth back onto docs (immutable
    rewrite of the reference's in-place f32 update, ``lib/writer.py:303-350``).
    Returns the updated docs dataset.

    ``method``: "local" (driver numpy vectors, zero-copy edge pull),
    "dataset" (broadcast-vector groupby rounds), "join" (fully
    dataset-native join rounds — the beyond-driver-memory path), or
    "auto" (edge-count switch local→join at AUTO_JOIN_EDGE_THRESHOLD).
    """
    if method == "auto":
        method = "join" if edges.count() > AUTO_JOIN_EDGE_THRESHOLD else "local"
    if method == "join":
        accepted = docs.select_columns(["docid"])
        pr_ds = pagerank_dataset_join(edges, accepted, last_docid, tol=pr_tol)
        hits_ds = hits_dataset_join(edges, accepted, last_docid, tol=hits_tol)
        nparts = _cluster_join_partitions()
        joined = (
            docs.drop_columns(["pr_quality", "hub_quality", "auth_quality"])
            .join(pr_ds, join_type="inner", num_partitions=nparts, on=("docid",))
            .join(hits_ds, join_type="inner", num_partitions=nparts, on=("docid",))
        )
        return joined.map_batches(
            lambda t: t.drop_columns(["rank", "hub", "auth"])
            .append_column("pr_quality", pc.cast(t["rank"], pa.float32()))
            .append_column("hub_quality", pc.cast(t["hub"], pa.float32()))
            .append_column("auth_quality", pc.cast(t["auth"], pa.float32())),
            batch_format="pyarrow",
        )
    if method == "local":
        src, dst = _edges_numpy(edges)
        pr = pagerank_local(src, dst, last_docid, tol=pr_tol)
        hub, auth = hits_local(src, dst, last_docid, tol=hits_tol)
    else:
        pr = pagerank_dataset(edges, last_docid, tol=pr_tol)
        hub, auth = hits_dataset(edges, last_docid, tol=hits_tol)

    ref = ray.put((pr, hub, auth))

    def attach(batch: pa.Table) -> pa.Table:
        pr_, hub_, auth_ = ray.get(ref)
        ids = batch["docid"].to_numpy()
        batch = batch.drop_columns(["pr_quality", "hub_quality", "auth_quality"])
        return (
            batch.append_column("pr_quality", pa.array(pr_[ids].astype(np.float32)))
            .append_column("hub_quality", pa.array(hub_[ids].astype(np.float32)))
            .append_column("auth_quality", pa.array(auth_[ids].astype(np.float32)))
        )

    return docs.map_batches(attach, batch_format="pyarrow")
