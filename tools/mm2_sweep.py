"""Offline calibration harness for the ANIminimap2 chain reconstruction.

Caches genome sketches and anchors for the bacterial fixture set, then
re-runs ONLY the chaining + PAF assembly per parameter variant (~23 s a
variant on a 2-core host), printing each pair's identity/aln deviation
from the fixture matrices. Used in round 3 to pin min_mid_occ=50, the
two-pass rescue geometry and the surrogate priority, and to rule out
pri_mode / inner_dist / max_gap / min_sc / size_cap / RMQ_FLAGS
alternatives (see CLAUDE.md ANIminimap2 notes).

Usage:
    python tools/mm2_sweep.py "[dict(), dict(RMQ_PRI_MODE=1)]"
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np, time
from pathlib import Path
import pandas as pd
from pyani_plus_tpu.genomes import load_genome
from pyani_plus_tpu.utils import filename_stem
from pyani_plus_tpu.ops import mm2

d = Path("/root/reference/tests/fixtures/bacterial_example")
genomes = {filename_stem(p.name): load_genome(p) for p in sorted(d.glob("*.gz"))}
exp_i = pd.read_csv(d/"matrices/ANIminimap2_identity.tsv", sep="\t", index_col=0)
exp_a = pd.read_csv(d/"matrices/ANIminimap2_aln_lengths.tsv", sep="\t", index_col=0)

k, w = 19, 10
sketches = {}  # name -> list of per-record sketches
for n, g in genomes.items():
    sketches[n] = [mm2.sketch(np.asarray(r.codes), k, w) for r in g.records]

# cache anchors per (qname, qrec_idx, tname)
anchor_cache = {}
def get_anchors(qn, qi, tn):
    key = (qn, qi, tn)
    if key not in anchor_cache:
        index = mm2.build_index(sketches[tn])
        mid_occ = mm2.mid_occ_threshold(index[0])
        qh, qp, qs_ = sketches[qn][qi]
        qlen = int(np.asarray(genomes[qn].records[qi].codes).size)
        anchor_cache[key] = (mm2.collect_anchors(index, qh, qp, qs_, qlen, k, mid_occ), qlen)
    return anchor_cache[key]

def pair_result(qn, tn):
    g_q, g_t = genomes[qn], genomes[tn]
    aligned = identical = 0
    qry_regions, ref_regions = {}, {}
    for qi in range(len(g_q.records)):
        anchors, qlen = get_anchors(qn, qi, tn)
        # replicate map_query_multi post-anchor logic
        pass1 = []
        for (tid, rel), (x, y) in anchors.items():
            for score, idx in mm2.chain_anchors(x, y, k):
                pass1.append((score, tid, rel, idx))
        pass1.sort(key=lambda c: -c[0])
        final = []
        do_rescue = False
        if len(pass1) > 1:
            _, ttid, trel, tidx = pass1[0]
            cy = anchors[ttid, trel][1][tidx]
            span = int(cy[-1]) - int(cy[0])
            do_rescue = (qlen - span > mm2.RMQ_RESCUE_SIZE or span > qlen * mm2.RMQ_RESCUE_RATIO)
        if do_rescue:
            surviving = {}
            for _, tid, rel, idx in pass1:
                surviving.setdefault((tid, rel), []).append(idx)
            for (tid, rel), idx_list in surviving.items():
                x, y = anchors[tid, rel]
                take = np.sort(np.concatenate(idx_list))
                sx, sy = x[take], y[take]
                o = np.lexsort((sy, sx))
                sx, sy = sx[o], sy[o]
                for score, idx in mm2.chain_anchors(sx, sy, k, pass2=True):
                    final.append((score, tid, rel, sx[idx], sy[idx]))
        else:
            for score, tid, rel, idx in pass1:
                if score >= mm2.MIN_CHAIN_SCORE and idx.size >= mm2.MIN_CNT:
                    x, y = anchors[tid, rel]
                    final.append((score, tid, rel, x[idx], y[idx]))
        regions = []
        for score, tid, rel, cx, cy in final:
            mlen, blen = mm2._mlen_blen(cx, cy, k)
            qs0 = int(cy[0]) - (k-1); qe0 = int(cy[-1]) + 1
            qstart, qend = (qlen - qe0, qlen - qs0) if rel == 1 else (qs0, qe0)
            regions.append(mm2.PafRecord(qstart=qstart, qend=qend, strand="-" if rel else "+",
                tstart=int(cx[0]) - (k-1), tend=int(cx[-1]) + 1, mlen=mlen, blen=blen,
                mapq=60, cnt=int(cx.size), score=score, subsc=0, tseq_id=tid))
        regions.sort(key=lambda r: -r.score)
        primaries = []
        for reg in regions:
            parent = None
            for pri in primaries:
                ov = min(reg.qend, pri.qend) - max(reg.qstart, pri.qstart)
                if ov > 0 and ov > mm2.MASK_LEVEL * min(reg.qend-reg.qstart, pri.qend-pri.qstart):
                    parent = pri; break
            if parent is None:
                primaries.append(reg)
            elif parent.subsc == 0:
                parent.subsc = reg.score
        for pri in primaries:
            pri.mapq = mm2._mapq(pri.score, pri.subsc, pri.cnt)
        for rec in primaries:
            if rec.mapq == 0: continue
            aligned += (rec.tend-rec.tstart+1)+(rec.qend-rec.qstart+1)
            identical += rec.mlen
            ref_regions.setdefault(rec.tseq_id, []).append((rec.tstart, rec.tend))
            qry_regions.setdefault(qi, []).append((rec.qstart, rec.qend))
    from pyani_plus_tpu.methods.animinimap2 import _interval_union_inclusive
    identity = 2.0*identical/aligned if aligned else None
    qry_aligned = sum(_interval_union_inclusive(v) for v in qry_regions.values())
    return identity, qry_aligned

def run_variant(tag, pairs):
    devs = []
    for qn, tn in pairs:
        ident, aln = pair_result(qn, tn)
        di = ident - exp_i.loc[qn, tn]
        da = (aln - exp_a.loc[qn, tn]) / exp_a.loc[qn, tn]
        devs.append((qn, tn, di, da))
    wi = max(abs(x[2]) for x in devs); wa = max(abs(x[3]) for x in devs)
    print(f"{tag}: worst |id dev| {wi:.2e}  worst |aln rel| {wa:.2e}")
    return devs

names = list(genomes)
CROSS = [(a,b) for a in names for b in names if a != b]
EXACT = [("NC_002696","NC_011916"),("NC_011916","NC_002696"),("NC_002696","NC_002696")]
import itertools
if __name__ == "__main__":
    variants = eval(sys.argv[1]) if len(sys.argv) > 1 else [dict()]
    for v in variants:
        saved = {kk: getattr(mm2, kk) for kk in v}
        for kk, vv in v.items(): setattr(mm2, kk, vv)
        t0 = time.time()
        devs = run_variant(str(v), CROSS)
        for qn, tn, di, da in devs:
            if abs(di) > 1e-14:
                print(f"    {qn} vs {tn}: id {di:+.2e} aln {da:+.2e}")
        print(f"    ({time.time()-t0:.0f}s)")
        for kk, vv in saved.items(): setattr(mm2, kk, vv)
