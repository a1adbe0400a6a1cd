#!/usr/bin/env python3
"""Static lint for the boundary-rounding anti-pattern the sf0.1/sf1
oracle sweeps kept finding (5 sites across rounds 9-10: q137, q216,
q133 x2, q201): **rounding a SUM onto a coarser grid than its terms**.

When every fold term is itself rounded to k dp, the fold sum lies
(almost) exactly on the k-dp grid, so rounding the SUM to m < k dp can
land EXACTLY on an m-dp half boundary, where Spark's and DuckDB's
rounding algorithms disagree (one rounds the decimal half up, the other
rounds the nearest-double which sits an ulp below/above). The fix
recipes (NOTES r10): round the output on the terms' grid (q133), or
emit the exact double unrounded (q201/q333).

Detection heuristic (textual, per query block in Queries*.scala):
  - a block is SPLIT at its aggregation boundary: the last occurrence
    of a fold marker (`aggregate(array_sort(` / `.agg(`);
  - scales of `round(..., k)` BEFORE the boundary are term grids;
    scales of `round(..., m)` / `roundZ(..., m)` AFTER are output grids;
  - flag if min(output grid) < max(term grid)  — the sum is being
    rounded onto a coarser grid than its terms.

False positives are expected (a ratio of fold sums is not on any grid);
every flagged site is hand-audited once and recorded in AUDITED below
with its disposition. The lint FAILS (exit 1) only on flagged sites NOT
in AUDITED — i.e. it guards NEW sites, keeping the class closed without
re-litigating the audited ones.

--selftest plants a synthetic bad block and asserts it flags.
"""
import re
import sys
import glob

# Hand-audited sites (round 11 audit; disposition recorded in NOTES.md).
# safe-ratio     : the coarser round wraps a RATIO/nonlinear function of
#                  fold sums, not the sum itself - ratios are not on any
#                  grid, so half-boundary landings have measure ~0.
# safe-grid      : output round scale >= the terms' effective grid
#                  (counting products of k-dp terms as 2k-dp).
# safe-exact     : the fold terms are exact (integers / integer-derived
#                  doubles), so the sum is exact and rounding is stable.
# fixed-rN       : a past sweep find, re-planned (kept here so the lint
#                  stays green on the historical sites).
AUDITED = {
    "q133_dsir_weights": "fixed-r10: output re-rounded on the terms' 6-dp grid",
    "q137_minhash_containment": "fixed-r9: terms' grid",
    "q201_top_brands_per_nation": "fixed-r10: exact decimal emitted unrounded",
    "q216_rolling_corr": "fixed-r9: terms' grid",
    "q333_binseg_split": "fixed-r11: exact doubles emitted unrounded",
    # direct fold-sum rounds dropped in r11 (unrounded output = the
    # bit-identical double both engines computed): q275, q294, q310,
    # q324, q339, q351, q361(chi2), q362(shannon_h), q416, q123, q125,
    # q127, q167, q406, q415, q390, q392(expected_records), q408
    # (bcss/wcss), q418 — those sites no longer flag.
    # ratios / nonlinear functions of fold sums (not grid-aligned — a
    # quotient of two fold sums, an OLS slope, a sqrt, or an exp is off
    # any decimal grid, so a half-boundary landing has measure ~0; the
    # kept round also guards end-stage libm ulp differences):
    "q126_dsir_source_logprob": "safe-ratio: log-prob normalized by exact counts",
    "q277_heaps_law": "safe-ratio: OLS slope ratio; k guards end-stage exp()",
    "q284_clustering_eval": "safe-ratio: NMI = mi/sqrt(hc*hn); purity exact-int ratio",
    "q297_price_elasticity": "safe-ratio: OLS slope = ratio of fold sums",
    "q302_levene_bf": "safe-ratio: F-statistic = ratio of scaled fold sums",
    "q308_zipf_slope": "safe-ratio: OLS slope = ratio of fold sums",
    "q323_kde_grid": "safe-exact: grid points are dyadic rationals (int/64); density = ratio",
    "q332_hurst_rs": "safe-ratio: OLS slope = ratio of fold sums",
    "q334_weibull_fit": "safe-ratio: OLS slope/exp of ratio",
    "q344_lexical_overlap": "safe-ratio: Jaccard of exact counts",
    "q349_kneser_ney": "safe-ratio: discounted prob = ratio",
    "q404_js_divergence": "safe-ratio: JS from probability ratios",
    "q444_zipf_fit": "safe-ratio: OLS slope/intercept/r2 from fold sums",
    "q453_durbin_watson": "safe-ratio: DW = ratio of fold sums",
    "q455_ljung_box": "safe-ratio: autocorr ratios",
    "q456_wasserstein_drift": "safe-grid: terms unrounded doubles, output 4dp",
    "q457_stl_strengths": "safe-ratio: variance ratios",
    "q458_hill_tail": "safe-ratio: mean of logs ratio",
    "q461_heaps_fit": "safe-ratio: OLS beta = cov/var ratio",
    "q134_mix_temperature": "safe-ratio: weight = sw/tot ratio of fold sums",
    "q369_sparse_cosine_join": "safe-ratio: cosine = dot/(na*nb)",
    "q414_v_measure": "safe-ratio: h/c/v are ratios of fold sums",
    "q174_rrf_fusion": "safe-ratio: rrf = sum of 1/(60+rank) integer ratios",
    "q383_matryoshka_recall": "safe-exact: recall = n/10 hits its own 2-dp grid point",
    "q407_sign_quant_recall": "safe-exact: recall = n/10 hits its own 2-dp grid point",
    "q408_calinski_harabasz": "safe-ratio: ch_index ratio (bcss/wcss unrounded)",
    "q409_davies_bouldin": "safe-ratio: sigma sqrt-of-mean, db_term = (si+sj)/dc",
    "q272_bh_fdr": "safe-ratio: z-score and erf-based p are off-grid; rounds guard libm",
    "q392_record_counts": "safe-ratio: record_ratio = int/fold-sum (expected unrounded)",
    "q427_bradley_terry": "safe-ratio: bt_score = p/sum(p)",
    "q433_topsis": "safe-ratio: sqrt distances and dm/(dp+dm) are off-grid",
    "q436_topsis_kmv": "safe-ratio: same TOPSIS shape as q433 (sketch-faced twin)",
}

BLOCK_RE = re.compile(r'"(q\d+[a-z0-9_]*)"\s*->\s*\(\(s, dir\)')
ROUND_RE = re.compile(r'\bround(?:Z)?\(')
FOLD_MARKERS = ("aggregate(array_sort(", ".agg(")


def round_scales(text):
    """Scales of every round(/roundZ( call in `text`, by matching the
    closing paren of each call and reading the trailing integer arg."""
    out = []
    for m in ROUND_RE.finditer(text):
        depth, i = 1, m.end()
        while i < len(text) and depth:
            if text[i] == "(":
                depth += 1
            elif text[i] == ")":
                depth -= 1
            i += 1
        inner = text[m.end():i - 1]
        tail = re.search(r',\s*(\d+)\s*$', inner)
        if tail:
            out.append((int(tail.group(1)), m.start()))
    return out


def audit(paths):
    flagged = []
    for path in paths:
        src = open(path).read()
        marks = list(BLOCK_RE.finditer(src))
        for j, m in enumerate(marks):
            name = m.group(1)
            end = marks[j + 1].start() if j + 1 < len(marks) else len(src)
            block = src[m.start():end]
            cut = max((block.rfind(f) for f in FOLD_MARKERS), default=-1)
            if cut < 0:
                continue
            scales = round_scales(block)
            terms = [s for s, pos in scales if pos < cut]
            outs = [s for s, pos in scales if pos >= cut]
            if terms and outs and min(outs) < max(terms):
                flagged.append((name, path, max(terms), min(outs)))
    return flagged


def selftest():
    import tempfile, os
    bad = '''
    "q999_planted_bad" -> ((s, dir) => {
      val t = x.select(round(col("v"), 6).as("t"))
      t.agg(aggregate(array_sort(collect_list(struct(col("k"),
        col("t").as("t")))), lit(0.0), (a, e) => a + e.getField("t"))
        .as("s"))
       .select(round(col("s"), 4).as("out"))
    }),
    "q998_planted_ok" -> ((s, dir) => {
      val t = x.select(round(col("v"), 4).as("t"))
      t.agg(sum(col("t")).as("s")).select(round(col("s"), 6).as("out"))
    }),
    '''
    with tempfile.NamedTemporaryFile("w", suffix=".scala", delete=False) as f:
        f.write(bad)
        p = f.name
    hits = audit([p])
    os.unlink(p)
    names = [h[0] for h in hits]
    assert "q999_planted_bad" in names, "selftest: planted bad site NOT flagged"
    assert "q998_planted_ok" not in names, "selftest: clean site flagged"
    print("roundlint selftest OK (planted site flagged, control clean)")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
        sys.exit(0)
    paths = sorted(glob.glob("src/main/scala/graft/Queries*.scala"))
    flagged = audit(paths)
    new = [f for f in flagged if f[0] not in AUDITED]
    for name, path, k, m in flagged:
        tag = AUDITED.get(name, "** NEW - AUDIT REQUIRED **")
        print(f"{name}: terms {k}dp -> output {m}dp  [{tag}]  ({path})")
    print(f"\n{len(flagged)} flagged, {len(new)} unaudited")
    sys.exit(1 if new else 0)
