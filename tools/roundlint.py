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

**Magnitude pass (r12, the q294/q333 lesson)**: the dual failure —
per-TERM rounds inside folds become boundary-fragile when the rounded
operand can carry cents-scale magnitudes: at |x| ~ 1e8-1e10 a 4-6 dp
step sits at/below the double ulp (ulp(1.5e10) ~ 2e-6), so the two
engines can round the same IEEE quotient to different half-steps
(q333's sf1 find; q294's sf0.01 find at cents ~1e8). Detection: a
block whose text carries a cents-magnitude marker (`* 100 AS BIGINT`
cast / cents / *price columns) AND a term-side round(_, k>=4) is
flagged for audit; dispositions live in MAG_AUDITED (same contract as
AUDITED: lint fails only on UNAUDITED sites).
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

# Magnitude pass: cents-scale markers + minimum fragile scale.
CENTS_RE = re.compile(
    r'\*\s*100\s+as\s+bigint|\bcents\b|totalprice|extendedprice', re.I)
MAG_MIN_SCALE = 4

# Hand-audited magnitude-pass sites (r12 audit; NOTES.md). Disposition
# vocabulary:
#   safe-small  : the rounded operand is a RATIO / share / per-unit
#                 value bounded ~O(1)-O(1e5); 10^-k step sits far above
#                 its ulp at any sf.
#   safe-exact  : operand is an exact integer-derived double below 2^53
#                 (the round is an idempotent formality).
#   fixed-rN    : a past find, re-planned to exact/integer emission.
MAG_AUDITED = {
    # Fixed in r12 (fold-internal rounds removed BOTH engines; the
    # ordered folds are identical IEEE chains unrounded):
    "q297_price_elasticity": "fixed-r12: 12-dp per-step rounds dropped (acc to ~1e5 "
        "vs the ~4.5e3 safe bound for k=12; month-grid-bounded but marginal)",
    "q302_levene_bf": "fixed-r12: ni*dm^2 / wss reach ~1e19 at sf10 — 9-dp step deep "
        "sub-ulp; per-term+per-step rounds dropped",
    "q320_price_index": "fixed-r12: cross terms ~1e14+ at sf10 — 6-dp step sub-ulp; "
        "per-term+per-step rounds dropped",
    "q323_kde_grid": "fixed-r12: kv ∝ N/401 (sub-ulp ~sf100); per-term+per-step "
        "rounds dropped (9-dp term round; the audited output rounds remain)",
    # Bounded-magnitude sites (operand does NOT grow with sf, or is a
    # log/ratio O(1..1e3) — step stays >=100x above ulp at any scale):
    "q275_forecast_backtest": "safe-small: fold acc = <=28 O(1) sMAPE/MAPE ratios "
        "(calendar-bounded holdout); 12-dp step at |acc|<=1e2",
    "q332_hurst_rs": "safe-small: R/S ratios O(sqrt(bs)<=12), day-grid block counts; "
        "acc<=1e4 at 9dp, <=40 at 12dp",
    "q483_seasonal_mk": "safe-exact: block-split artifact — q483's own output is one "
        "unrounded division; the flagged round is the trailing hhiFinish helper "
        "(share^2 fold O(1e4) at 4dp, separately sf1-swept)",
    "q458_hill_tail": "safe-small: ln(x_i/x_k) in [0,2.3], k=100-bounded fold; "
        "acc<=230 at 6dp",
    "q384_rbo_rankings": "safe-small: depth terms w_d*x_d/d <= 0.1*20, 20-deep fold; "
        "acc<=2 at 9dp",
    "q427_bradley_terry": "safe-small: MM terms n_ij/(p_i+p_j) O(1..25), 24-opponent "
        "fold; acc<=~300 at 9dp",
    "q433_topsis": "safe-small: entropy terms share*ln(share) in [-0.37,0], 25-brand "
        "fold; x2/x3 power sums fold UNROUNDED; output rounds are ratios",
    "q436_topsis_kmv": "safe-small: same TOPSIS entropy-term shape as q433",
    "q500_spearman_brands": "safe-exact: block-split artifact (q500 is now the LAST "
        "query block, the q483 precedent) — q500's own rho is ONE unrounded double "
        "division of exact integer ranks; the flagged rounds belong to the trailing "
        "hhiFinish/benfordFinish shared helpers, separately audited via their owning "
        "queries (q446/q445, sf1-swept)",
}


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


def audit_magnitude(paths):
    """Term-side round(_, k>=4) in a fold block that carries a
    cents-magnitude marker — the q294/q333 fragility class."""
    flagged = []
    for path in paths:
        src = open(path).read()
        marks = list(BLOCK_RE.finditer(src))
        for j, m in enumerate(marks):
            name = m.group(1)
            end = marks[j + 1].start() if j + 1 < len(marks) else len(src)
            block = src[m.start():end]
            cut = max((block.rfind(f) for f in FOLD_MARKERS), default=-1)
            if cut < 0 or not CENTS_RE.search(block):
                continue
            terms = [s for s, pos in round_scales(block)
                     if pos < cut and s >= MAG_MIN_SCALE]
            if terms:
                flagged.append((name, path, max(terms)))
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
    names = [h[0] for h in hits]
    assert "q999_planted_bad" in names, "selftest: planted bad site NOT flagged"
    assert "q998_planted_ok" not in names, "selftest: clean site flagged"
    os.unlink(p)
    # magnitude pass: a term-side 6-dp round over a cents-scale sum must
    # flag; the same shape WITHOUT a cents marker must not.
    mag_bad = '''
    "q997_planted_mag" -> ((s, dir) => {
      val t = x.select(round(col("rev"), 6).as("t")) // sum cents revenue
        .withColumn("c", expr("cast(cast(p as decimal(18,2)) * 100 as bigint)"))
      t.agg(aggregate(array_sort(collect_list(struct(col("k"),
        col("t").as("t")))), lit(0.0), (a, e) => a + e.getField("t")).as("s"))
    }),
    "q996_planted_mag_ok" -> ((s, dir) => {
      val t = x.select(round(col("share"), 6).as("t"))
      t.agg(aggregate(array_sort(collect_list(struct(col("k"),
        col("t").as("t")))), lit(0.0), (a, e) => a + e.getField("t")).as("s"))
    }),
    '''
    with tempfile.NamedTemporaryFile("w", suffix=".scala", delete=False) as f:
        f.write(mag_bad)
        p = f.name
    mhits = [h[0] for h in audit_magnitude([p])]
    os.unlink(p)
    assert "q997_planted_mag" in mhits, "selftest: planted MAGNITUDE site NOT flagged"
    assert "q996_planted_mag_ok" not in mhits, "selftest: cents-free control flagged"
    print("roundlint selftest OK (planted sites flagged, controls clean)")


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
    mflagged = audit_magnitude(paths)
    mnew = [f for f in mflagged if f[0] not in MAG_AUDITED]
    for name, path, k in mflagged:
        tag = MAG_AUDITED.get(name, "** NEW - AUDIT REQUIRED **")
        print(f"{name}: cents-scale term round at {k}dp  [mag: {tag}]  ({path})")
    print(f"\n{len(flagged) + len(mflagged)} flagged, "
          f"{len(new) + len(mnew)} unaudited")
    sys.exit(1 if new or mnew else 0)
