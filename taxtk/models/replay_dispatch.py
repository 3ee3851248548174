"""Batched native dispatch for the RPA replay passes.

One C call per pass per macro-batch (taxtk/native/replay.cpp *_batch):
per-task ctypes calls spent more time marshalling pointers than replaying
(measured on the 2000-set protein e2e: 0.94 s per-task native vs 0.21 s
Python vs ~0.1 s batched).  The executor calls run_pass0/1/2; tasks that
cannot run natively (decision logging, mesh-merged pass 0, library
unavailable) fall back to their Python replay inline, so a batch may mix
both paths.  Parity: tests/test_replay_native.py pins native == Python
state bit-for-bit; the reference-code oracle suite pins the GFF3.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..native import replay as _nr
from .rpa import FLT_MAX, PairKey, RpaTask, f32

_f32 = np.float32


def _native_group(tasks, merged_by_task) -> Optional[List[int]]:
    """Indices of tasks to batch natively, or None when the library is
    unavailable (callers then run the plain per-task loop)."""
    if not _nr.available():
        return None
    group = []
    for ti, t in enumerate(tasks):
        if t.result is not None:
            continue
        if t.logging or (merged_by_task is not None
                         and merged_by_task.get(ti) is not None):
            continue
        group.append(ti)
    return group


def _ptr(a):
    return a.ctypes.data


def _concat_meta(tasks_sel):
    ns = np.fromiter((t.n for t in tasks_sel), np.int32,
                     count=len(tasks_sel))
    roff = np.zeros(len(tasks_sel), np.int64)
    np.cumsum(ns[:-1], out=roff[1:])
    return ns, roff, int(ns.sum())


def _record_arrays(tasks_sel, total):
    scores = np.empty(total, np.float64)
    idents = np.empty(total, np.int32)
    nodes = np.empty(total, np.int32)
    o = 0
    for t in tasks_sel:
        s, i, nd = t._native_arrays()
        n = t.n
        scores[o:o + n] = s
        idents[o:o + n] = i
        nodes[o:o + n] = nd
        o += n
    return scores, idents, nodes


def run_pass0(tasks: List[RpaTask], pair_caches, merged_by_task=None):
    """Batched replay_pass0 over a macro-batch; returns reqs per task."""
    group = _native_group(tasks, merged_by_task)
    reqs_out: List[List[PairKey]] = [[] for _ in tasks]
    if group is None:
        for ti, t in enumerate(tasks):
            if t.result is None:
                reqs_out[ti] = t.replay_pass0(
                    pair_caches[ti],
                    merged=(merged_by_task or {}).get(ti),
                )
        return reqs_out
    in_group = set(group)
    for ti, t in enumerate(tasks):
        if t.result is None and ti not in in_group:
            reqs_out[ti] = t.replay_pass0(
                pair_caches[ti], merged=(merged_by_task or {}).get(ti)
            )
    if not group:
        return reqs_out

    tasks_sel = [tasks[ti] for ti in group]
    m = len(tasks_sel)
    ns, roff, total = _concat_meta(tasks_sel)
    scores, idents, nodes = _record_arrays(tasks_sel, total)
    exact = np.zeros(total, np.uint8)
    aligned = np.zeros(total, np.uint8)
    qdist_c = np.empty(total, np.float32)
    qsim_c = np.empty(total, np.float32)
    o = 0
    for gi, (ti, t) in enumerate(zip(group, tasks_sel)):
        n = t.n
        exact[o:o + n] = t._pass0_exact
        aligned[o:o + n] = t._pass0_aligned
        pc = pair_caches[ti]
        for i, al in enumerate(t._pass0_aligned):
            if al:
                v = pc[("q", i, -1)]
                qdist_c[o + i] = v.distance
                qsim_c[o + i] = v.similarity
        o += n
    tl, tr, tp, td, root = _nr.tax_arrays(tasks_sel[0].tax)
    qd = np.empty(total, np.float32)
    qs = np.empty(total, np.float32)
    qgroup_buf = np.empty(total, np.int32)
    out5 = np.zeros((m, 5), np.int32)
    cnt = np.zeros((m, 2), np.int32)
    _nr.load().taxtk_rpa_pass0_batch(
        m, _ptr(ns), _ptr(roff), _ptr(scores), _ptr(idents), _ptr(nodes),
        _ptr(exact), _ptr(aligned), _ptr(qdist_c), _ptr(qsim_c),
        _ptr(tl), _ptr(tr), _ptr(tp), _ptr(td), root,
        _ptr(qd), _ptr(qs), _ptr(qgroup_buf), _ptr(out5), _ptr(cnt),
    )
    for gi, (ti, t) in enumerate(zip(group, tasks_sel)):
        o, n = int(roff[gi]), t.n
        t._use_native = True
        t.querydistance = qdv = qd[o:o + n]
        t.querysimilarity = qs[o:o + n]
        qgroup = qgroup_buf[o:o + int(out5[gi, 0])].tolist()
        t.qgroup = qgroup
        t.rtax = int(out5[gi, 1])
        t.lca_allnodes = int(out5[gi, 2])
        t.anchors_support = int(out5[gi, 3])
        t.lnode_global = t.rtax
        t.unode_global = t.rtax
        t.counters["p0"] += int(cnt[gi, 0])
        t.counters["p0n"] += int(cnt[gi, 1])
        nz = np.flatnonzero(qdv != _f32(0.0)).tolist()
        reqs: List[PairKey] = []
        for a in qgroup:
            reqs.extend(("s", i, a) for i in nz if i != a)
        reqs_out[ti] = reqs
    return reqs_out


def run_pass1(tasks: List[RpaTask], pair_caches):
    reqs_out: List[List[PairKey]] = [[] for _ in tasks]
    group: List[int] = []
    for ti, t in enumerate(tasks):
        if t.result is not None:
            continue
        if getattr(t, "_use_native", False):
            group.append(ti)
        else:
            reqs_out[ti] = t.replay_pass1(pair_caches[ti])
    if not group:
        return reqs_out

    tasks_sel = [tasks[ti] for ti in group]
    m = len(tasks_sel)
    ns, roff, total = _concat_meta(tasks_sel)
    scores, idents, nodes = _record_arrays(tasks_sel, total)
    qd = np.concatenate([t.querydistance for t in tasks_sel])
    qsim = np.concatenate([t.querysimilarity for t in tasks_sel])
    qrlen = np.fromiter((t.qrlength for t in tasks_sel), np.int32, count=m)
    exclude = np.fromiter(
        (t.exclude_factor for t in tasks_sel), np.float32, count=m
    )
    qg_n = np.fromiter((len(t.qgroup) for t in tasks_sel), np.int32, count=m)
    qg_off = np.zeros(m, np.int64)
    np.cumsum(qg_n[:-1], out=qg_off[1:])
    qgroup = np.empty(int(qg_n.sum()), np.int32)
    for gi, t in enumerate(tasks_sel):
        qgroup[int(qg_off[gi]):int(qg_off[gi]) + len(t.qgroup)] = t.qgroup
    rtax = np.fromiter((t.rtax for t in tasks_sel), np.int32, count=m)
    lnode = np.fromiter(
        (t.lnode_global for t in tasks_sel), np.int32, count=m
    )
    unode = np.fromiter(
        (t.unode_global for t in tasks_sel), np.int32, count=m
    )
    sd_n = qg_n.astype(np.int64) * ns
    sd_off = np.zeros(m, np.int64)
    np.cumsum(sd_n[:-1], out=sd_off[1:])
    sdist = np.empty(int(sd_n.sum()), np.float32)
    zero = _f32(0.0)
    for gi, (ti, t) in enumerate(zip(group, tasks_sel)):
        n = t.n
        pc = pair_caches[ti]
        qdv = t.querydistance
        mat = sdist[int(sd_off[gi]):int(sd_off[gi]) + len(t.qgroup) * n]
        for r, a in enumerate(t.qgroup):
            row = mat[r * n:(r + 1) * n]
            for i in range(n):
                if i != a and qdv[i] != zero:
                    row[i] = pc[("s", i, a)].distance
    tl, tr, tp, td, root = _nr.tax_arrays(tasks_sel[0].tax)
    outgroup_buf = np.empty(total, np.int32)
    f32o = np.zeros((m, 2), np.float32)
    i32o = np.zeros((m, 4), np.int32)
    cnt = np.zeros((m, 2), np.int32)
    _nr.load().taxtk_rpa_pass1_batch(
        m, _ptr(ns), _ptr(roff), _ptr(scores), _ptr(idents), _ptr(nodes),
        _ptr(qrlen), _ptr(exclude), _ptr(qd), _ptr(qsim), _ptr(qgroup),
        _ptr(qg_n), _ptr(qg_off), _ptr(rtax), _ptr(lnode), _ptr(unode),
        _ptr(sdist), _ptr(sd_off), _ptr(tl), _ptr(tr), _ptr(tp), _ptr(td),
        root, _ptr(outgroup_buf), _ptr(f32o), _ptr(i32o), _ptr(cnt),
    )
    for gi, (ti, t) in enumerate(zip(group, tasks_sel)):
        o, n = int(roff[gi]), t.n
        outgroup = outgroup_buf[o:o + int(i32o[gi, 0])].tolist()
        t.outgroup = outgroup
        t.ival_global = f32o[gi, 0]
        t.bandfactor_max = f32o[gi, 1]
        t.lnode_global = int(i32o[gi, 1])
        t.unode_global = int(i32o[gi, 2])
        t.pass1_anchor_count += int(i32o[gi, 3])
        t.counters["p1"] += int(cnt[gi, 0])
        t.counters["p1n"] += int(cnt[gi, 1])
        qdv = t.querydistance
        reqs: List[PairKey] = []
        for a in outgroup:
            reqs.extend(("s", i, a) for i in range(n) if i != a)
            if qdv[a] == FLT_MAX:
                reqs.append(("q", a, -1))
        reqs_out[ti] = reqs
    return reqs_out


def run_pass2(tasks: List[RpaTask], pair_caches) -> None:
    group: List[int] = []
    for ti, t in enumerate(tasks):
        if t.result is not None:
            continue
        if getattr(t, "_use_native", False):
            group.append(ti)
        else:
            t.replay_pass2(pair_caches[ti])
    if not group:
        return

    tasks_sel = [tasks[ti] for ti in group]
    m = len(tasks_sel)
    ns, roff, total = _concat_meta(tasks_sel)
    scores, idents, nodes = _record_arrays(tasks_sel, total)
    qd = np.concatenate([t.querydistance for t in tasks_sel])
    qsim = np.concatenate([t.querysimilarity for t in tasks_sel])
    qrlen = np.fromiter((t.qrlength for t in tasks_sel), np.int32, count=m)
    exclude = np.fromiter(
        (t.exclude_factor for t in tasks_sel), np.float32, count=m
    )
    bf = np.fromiter(
        (t.bandfactor_max for t in tasks_sel), np.float32, count=m
    )
    ival = np.fromiter(
        (t.ival_global for t in tasks_sel), np.float32, count=m
    )
    og_n = np.fromiter(
        (len(t.outgroup) for t in tasks_sel), np.int32, count=m
    )
    og_off = np.zeros(m, np.int64)
    np.cumsum(og_n[:-1], out=og_off[1:])
    og_total = int(og_n.sum())
    outgroup = np.empty(og_total, np.int32)
    qdist2 = np.full(og_total, np.nan, np.float32)
    qsim2 = np.full(og_total, np.nan, np.float32)
    lca_all = np.fromiter(
        (t.lca_allnodes for t in tasks_sel), np.int32, count=m
    )
    lnode = np.fromiter(
        (t.lnode_global for t in tasks_sel), np.int32, count=m
    )
    unode = np.fromiter(
        (t.unode_global for t in tasks_sel), np.int32, count=m
    )
    sd_n = og_n.astype(np.int64) * ns
    sd_off = np.zeros(m, np.int64)
    np.cumsum(sd_n[:-1], out=sd_off[1:])
    sdist = np.empty(int(sd_n.sum()), np.float32)
    for gi, (ti, t) in enumerate(zip(group, tasks_sel)):
        n = t.n
        pc = pair_caches[ti]
        oo = int(og_off[gi])
        mat = sdist[int(sd_off[gi]):int(sd_off[gi]) + len(t.outgroup) * n]
        for r, a in enumerate(t.outgroup):
            outgroup[oo + r] = a
            row = mat[r * n:(r + 1) * n]
            for i in range(n):
                if i != a:
                    row[i] = pc[("s", i, a)].distance
            qv = pc.get(("q", a, -1))
            if qv is not None:
                qdist2[oo + r] = qv.distance
                qsim2[oo + r] = qv.similarity
    tl, tr, tp, td, root = _nr.tax_arrays(tasks_sel[0].tax)
    f32o = np.zeros(m, np.float32)
    i32o = np.zeros(m, np.int32)
    cnt = np.zeros((m, 2), np.int32)
    _nr.load().taxtk_rpa_pass2_batch(
        m, _ptr(ns), _ptr(roff), _ptr(scores), _ptr(idents), _ptr(nodes),
        _ptr(qrlen), _ptr(exclude), _ptr(bf), _ptr(qd), _ptr(qsim),
        _ptr(outgroup), _ptr(og_n), _ptr(og_off), _ptr(lca_all),
        _ptr(lnode), _ptr(unode), _ptr(ival), _ptr(sdist), _ptr(sd_off),
        _ptr(qdist2), _ptr(qsim2), _ptr(tl), _ptr(tr), _ptr(tp), _ptr(td),
        root, _ptr(f32o), _ptr(i32o), _ptr(cnt),
    )
    for gi, (ti, t) in enumerate(zip(group, tasks_sel)):
        o, n = int(roff[gi]), t.n
        # pass 2 mutates the distance state in place; re-point the task at
        # the batch views so later readers (tests, binning) see the final
        # values
        t.querydistance = qd[o:o + n]
        t.querysimilarity = qsim[o:o + n]
        t.counters["p2"] += int(cnt[gi, 0])
        t.counters["p2n"] += int(cnt[gi, 1])
        t.result = dict(
            kind="full",
            qrstart=t.qrstart,
            qrstop=t.qrstop,
            lnode=t.lnode_global,
            unode=int(i32o[gi]),
            support=t.anchors_support,
            rtax=t.rtax,
            ival=f32o[gi],
            signal=f32(0.0),
        )
