"""Tiles, skew agg, lineage resume, ANN recall, dedup pytest-side checks."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_shapefile_spark.functions import cells as C


def test_tile_counts_matches_plain_groupby(spark):
    from go_shapefile_spark.operators.tiles import tile_counts
    rng = np.random.default_rng(2)
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 5000),
                        "lat": rng.uniform(-90, 90, 5000)})
    df = spark.createDataFrame(pdf)
    got = tile_counts(df, res=5).toPandas().sort_values("cell").reset_index(drop=True)
    cells = C.cell_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 5)
    exp = pd.Series(cells).value_counts().sort_index()
    assert got["n"].sum() == 5000
    np.testing.assert_array_equal(got["cell"].to_numpy(), exp.index.to_numpy())
    np.testing.assert_array_equal(got["n"].to_numpy(), exp.to_numpy())


def test_salted_count_equals_plain(spark):
    from go_shapefile_spark.operators.skew import salted_count
    rng = np.random.default_rng(3)
    # skewed key distribution: 80% of rows on one key
    keys = np.where(rng.uniform(size=20000) < 0.8, 7, rng.integers(0, 50, 20000))
    pdf = pd.DataFrame({"cell": keys, "phash": rng.integers(-2**62, 2**62, 20000)})
    df = spark.createDataFrame(pdf)
    got = salted_count(df, ["cell"], n_salts=8, salt_src="phash") \
        .toPandas().sort_values("cell").reset_index(drop=True)
    exp = df.groupBy("cell").count().withColumnRenamed("count", "n") \
        .toPandas().sort_values("cell").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_rasterize_vectorize_roundtrip(spark):
    from go_shapefile_spark.operators.tiles import rasterize_polygons, vectorize_raster
    # one 5-point CW square polygon covering a known lon/lat box
    ring = [10.0, 10.0, 10.0, 40.0, 40.0, 40.0, 40.0, 10.0, 10.0, 10.0]
    polys = [{"fid": 1, "coords": np.array(ring), "ends": [10]}]
    raster = rasterize_polygons(spark, polys, res=4, tile_px=8)
    pixels = raster.toPandas()
    assert len(pixels) > 0
    rects = vectorize_raster(raster, tile_px=8).toPandas()
    # rectangles must cover exactly the same pixel set
    covered = set()
    for r in rects.itertuples(index=False):
        for x in range(r.x0, r.x1 + 1):
            for y in range(r.y0, r.y1 + 1):
                covered.add((r.cell, r.fid, x, y))
    original = set(zip(pixels.cell, pixels.fid, pixels.px, pixels.py))
    assert covered == original


def test_rasterize_real_countries(spark, ref_testdata):
    """E8 on real geometry: rasterized ne_110m pixel area must
    approximate each country's shoelace area, and the vectorized
    rectangles must cover exactly the rasterized pixels."""
    import os

    from go_shapefile_spark.operators.spatial_join import polygons_from_features
    from go_shapefile_spark.operators.tiles import rasterize_polygons, vectorize_raster
    from go_shapefile_spark.sources.shapefile import read_shapefile_df
    feats = read_shapefile_df(
        spark, os.path.join(ref_testdata, "110m-admin-0-countries.zip"))
    polys = polygons_from_features(feats.select("fid", "geometry").collect())
    big = [p for p in polys if len(p["coords"]) > 600][:5]  # large countries
    raster = rasterize_polygons(spark, big, res=6, tile_px=8)
    pix = raster.toPandas()
    assert len(pix) > 1000
    # pixel-count area vs shoelace area (planar degrees², loose bound
    # because pixels are coarse at res 6)
    n = 1 << 6
    px_area = (360.0 / n / 8) * (180.0 / n / 8)
    for p in big:
        x = p["coords"][0::2]
        y = p["coords"][1::2]
        # shoelace over all rings (holes subtract via winding)
        area = 0.0
        prev = 0
        for end in p["ends"]:
            rx, ry = x[prev // 2:end // 2], y[prev // 2:end // 2]
            area += 0.5 * np.sum(rx[:-1] * ry[1:] - rx[1:] * ry[:-1])
            prev = end
        area = abs(area)
        got = len(pix[pix.fid == p["fid"]]) * px_area
        assert got == pytest.approx(area, rel=0.25), f"fid {p['fid']}"
    # vectorize inverse: rectangles cover exactly the pixel set
    rects = vectorize_raster(raster, tile_px=8).toPandas()
    n_rect_pixels = int(((rects.x1 - rects.x0 + 1) * (rects.y1 - rects.y0 + 1)).sum())
    assert n_rect_pixels == len(pix)


def test_lineage_resume_idempotent(spark, tmp_path):
    from go_shapefile_spark.operators.lineage import (
        LineageLog, run_stage, stage_output)
    out = str(tmp_path / "out")
    lineage = LineageLog(str(tmp_path / "lineage"))
    calls = []

    def build_fail_on_c(key):
        calls.append(key)
        if key == "c" and calls.count("c") == 1:
            raise RuntimeError("simulated kill between partitions")
        return spark.range(10).withColumn("part_key", F.lit(key))

    # first run dies at partition c
    with pytest.raises(RuntimeError):
        run_stage("stage1", ["a", "b", "c", "d"], build_fail_on_c, out, lineage)
    assert set(lineage.done("stage1")) == {"a", "b"}

    # re-run: skips a, b; completes c, d — identical final state
    ran = run_stage("stage1", ["a", "b", "c", "d"], build_fail_on_c, out, lineage)
    assert set(ran) == {"c", "d"}
    assert set(lineage.done("stage1")) == {"a", "b", "c", "d"}
    result = stage_output(spark, out, "stage1")
    assert result.count() == 40
    # third run is a no-op
    assert run_stage("stage1", ["a", "b", "c", "d"], build_fail_on_c, out, lineage) == {}
    # recorded row counts match outputs
    assert all(rec["row_count"] == 10 for rec in lineage.done("stage1").values())


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    """LSH-ANN must reach high recall@10 against the exact baseline."""
    import duckdb

    from go_shapefile_spark.operators.similarity import cosine_topk_sql, lsh_ann_topk
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    dim = len(emb.select("embedding").first()[0])
    got = lsh_ann_topk(emb, dim=dim, k=10, n_planes=4, n_tables=12).toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    exact = con.execute(cosine_topk_sql("duck", k=10)).df()

    recall_num = recall_den = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        approx = set(got[got.query_id == qid]["neighbor_id"])
        recall_num += len(truth & approx)
        recall_den += len(truth)
    recall = recall_num / max(recall_den, 1)
    assert recall >= 0.7, f"ANN recall@10 too low: {recall:.3f}"


def test_lsh_single_pass_signatures_match_per_table(spark, sf_dir):
    """lsh_signatures_multi (one scan, all tables) must emit bit-identical
    buckets to the per-table lsh_signatures passes it replaced, and the
    ANN plan must contain exactly ONE Python stage (VERDICT r2 #4)."""
    from pyspark.sql import functions as F

    from go_shapefile_spark.operators.similarity import (
        lsh_ann_topk, lsh_signatures, lsh_signatures_multi)
    from go_shapefile_spark.plans.audit import executed_plan

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    multi = lsh_signatures_multi(emb, n_planes=4, n_tables=3).toPandas()
    for t in range(3):
        single = lsh_signatures(emb, dim, n_planes=4, seed=1234 + t) \
            .toPandas().set_index("vec_id")["bucket"]
        got = multi[multi.table == t].set_index("vec_id")["bucket"]
        assert got.sort_index().equals(single.sort_index())

    # one full-corpus signature pass + one pass over the filtered (2%)
    # query sliver — never n_tables passes, never a duplicated full scan
    plan = executed_plan(lsh_ann_topk(emb))
    n_python = sum(plan.count(m) for m in ("MapInPandas", "ArrowEvalPython",
                                           "BatchEvalPython"))
    assert n_python == 2, plan[:2000]


def test_neardup_bucketed_recall_and_plan(spark, sf_dir):
    """The bucketed near-dup path: (a) finds every TRUE near-duplicate
    (planted perturbed copies, cos >= 0.98), (b) reports only pairs the
    exact verify confirms, (c) plans without BroadcastNestedLoopJoin."""
    import duckdb
    import numpy as np

    from go_shapefile_spark.operators.similarity import (
        embedding_neardup_bucketed_sql, embedding_neardup_sql)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    base = spark.read.parquet(emb_path).toPandas()
    rng = np.random.default_rng(5)
    dup = base.copy()
    dup["vec_id"] = dup["vec_id"] + 100_000
    dup["embedding"] = dup["embedding"].map(
        lambda v: (np.asarray(v) + rng.normal(0, 0.002, len(v))).astype("float32"))
    both = pd.concat([base, dup], ignore_index=True)
    spark.createDataFrame(both).createOrReplaceTempView("embeddings")

    got = spark.sql(embedding_neardup_bucketed_sql(
        "spark", threshold=0.9)).toPandas()
    found = set(zip(got.vec_a, got.vec_b))
    # every planted (i, i+100k) true near-dup pair must be recalled
    missing = [(i, i + 100_000) for i in base["vec_id"]
               if (i, i + 100_000) not in found]
    assert not missing, f"missed {len(missing)} true near-dups"
    # soundness: every reported pair really passes the exact threshold
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    exact = con.execute(embedding_neardup_sql("duck", threshold=0.25)).df()
    spark.read.parquet(emb_path).createOrReplaceTempView("embeddings")
    got25 = spark.sql(embedding_neardup_bucketed_sql(
        "spark", threshold=0.25)).toPandas()
    exact_pairs = set(zip(exact.vec_a, exact.vec_b))
    got25_pairs = set(zip(got25.vec_a, got25.vec_b))
    assert got25_pairs <= exact_pairs  # no false positives after verify

    plan = spark.sql(embedding_neardup_bucketed_sql("spark", threshold=0.25)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_ann_recall_and_plan(spark, sf_dir):
    """IVF ANN (KMeans coarse quantizer + probed inverted lists) must
    reach recall@10 >= 0.7 vs the exact baseline, and its search join is
    an equi-join on centroid (no BNLJ / cartesian)."""
    import duckdb

    from go_shapefile_spark.operators.similarity import (
        cosine_topk_sql, ivf_ann_topk)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    result = ivf_ann_topk(emb, k=10)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = result.toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    exact = con.execute(cosine_topk_sql("duck", k=10)).df()
    num = den = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        approx = set(got[got.query_id == qid]["neighbor_id"])
        num += len(truth & approx)
        den += len(truth)
    assert num / max(den, 1) >= 0.7, f"IVF recall@10 too low: {num/den:.3f}"

    # sampled coarse-quantizer training (the 100-TB default) must still
    # clear the recall bar — the model quality, not the training-set
    # size, carries the guarantee
    got_s = ivf_ann_topk(emb, k=10, train_fraction=0.3,
                         n_probe=32).toPandas()
    num = den = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        approx = set(got_s[got_s.query_id == qid]["neighbor_id"])
        num += len(truth & approx)
        den += len(truth)
    assert num / max(den, 1) >= 0.7, \
        f"sampled-training IVF recall@10 too low: {num/den:.3f}"


def test_pq_kernels():
    """PQ codebook training is deterministic and seeded; reconstruction
    error shrinks with codebook size; a memorizing codebook (n_codes ==
    n_train) reconstructs exactly; non-divisible dims are rejected."""
    import numpy as np

    from go_shapefile_spark.operators.similarity import (_pq_codes_batch,
                                                         _unit, pq_train)

    rng = np.random.default_rng(0)
    x = _unit(rng.standard_normal((512, 64)))

    def recon_err(n_codes):
        books = pq_train(x, m=8, n_codes=n_codes, seed=1)
        codes = _pq_codes_batch(x, books)
        recon = np.concatenate([books[j][codes[:, j]] for j in range(8)],
                               axis=1)
        return np.linalg.norm(x - recon, axis=1).mean()

    e8, e64 = recon_err(8), recon_err(64)
    assert e64 < e8 < np.linalg.norm(x, axis=1).mean()  # better than zero

    assert np.array_equal(pq_train(x, 8, 32, seed=1),
                          pq_train(x, 8, 32, seed=1))
    assert not np.array_equal(pq_train(x, 8, 32, seed=1),
                              pq_train(x, 8, 32, seed=2))

    tiny = _unit(rng.standard_normal((16, 64)))
    books = pq_train(tiny, m=8, n_codes=16, seed=3, n_iter=1)
    codes = _pq_codes_batch(tiny, books)
    recon = np.concatenate([books[j][codes[:, j]] for j in range(8)],
                           axis=1)
    assert np.allclose(recon, tiny)       # memorizing codebook is exact

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(x, m=7, n_codes=8, seed=1)


def test_pq_ann_recall_and_plan(spark, sf_dir):
    """PQ ANN (coarse lists + ADC over m-byte codes + exact refine)
    clears recall@10 >= 0.7 vs the exact baseline; the encoded corpus
    really is m bytes per vector; no BNLJ/cartesian in the plan."""
    import duckdb
    import numpy as np

    from go_shapefile_spark.operators.similarity import (_unit,
                                                         cosine_topk_sql,
                                                         pq_ann_topk,
                                                         pq_encode,
                                                         pq_train)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    result = pq_ann_topk(emb, k=10, n_probe=24)
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = result.toPandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{emb_path}'")
    exact = con.execute(cosine_topk_sql("duck", k=10)).df()
    num = den = 0
    for qid, grp in exact.groupby("query_id"):
        truth = set(grp["neighbor_id"])
        approx = set(got[got.query_id == qid]["neighbor_id"])
        num += len(truth & approx)
        den += len(truth)
    assert num / max(den, 1) >= 0.7, f"PQ recall@10 too low: {num/den:.3f}"

    # compressed representation: m bytes per vector, decodable against
    # the same codebooks the driver trained
    sample = _unit(np.vstack(
        [r[0] for r in emb.select("embedding").collect()]).astype(float))
    books = pq_train(sample, m=8, n_codes=64, seed=7)
    codes = pq_encode(emb, books).toPandas()
    assert len(codes) == emb.count()
    assert codes["codes"].map(len).eq(8).all()


def test_winnowing_guarantee(spark):
    """The winnowing property: documents sharing a substring of length
    >= k + window - 1 share at least one fingerprint; disjoint-alphabet
    docs share none."""
    import pandas as pd

    from go_shapefile_spark.operators.text import winnow_fingerprint_sql

    shared = "the quick brown fox jumps over the lazy dog again"
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["AAAA " + shared + " BBBB",
                 "CCCCCCC " + shared + " DDDD",
                 "zzzzyyyyxxxxwwwwvvvvuuuuttttssssrrrrqqqq"],
    })
    spark.createDataFrame(pdf).createOrReplaceTempView("wdocs")
    sql = winnow_fingerprint_sql("spark", rel="wdocs", k=7, window=4)
    # swap the aggregate tail for the raw fingerprint sets
    body = sql[:sql.index("SELECT doc_id, COUNT(*)")]
    fps = spark.sql(body + "SELECT doc_id, fp FROM fps").toPandas()
    s1 = set(fps[fps.doc_id == 1].fp)
    s2 = set(fps[fps.doc_id == 2].fp)
    s3 = set(fps[fps.doc_id == 3].fp)
    assert s1 & s2          # shared >= k+w-1 substring -> shared fp
    assert not (s1 & s3) and not (s2 & s3)


def test_tile_pyramid_parent_arithmetic_and_single_scan(spark):
    """Pyramid levels from parent-cell arithmetic equal direct encoding
    at each resolution, and the input is scanned exactly once (levels
    are materialized, not re-derived per union branch)."""
    from go_shapefile_spark.operators.tiles import tile_pyramid

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, 20000),
                        "lat": rng.uniform(-90, 90, 20000)})
    df = spark.createDataFrame(pdf)
    pyr = tile_pyramid(df, max_res=7, min_res=4)
    got = pyr.toPandas()
    for r in range(4, 8):
        cells = C.cell_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), r)
        exp = pd.Series(cells).value_counts().sort_index()
        lvl = got[got.res == r].sort_values("cell")
        np.testing.assert_array_equal(lvl["cell"].to_numpy(),
                                      exp.index.to_numpy())
        np.testing.assert_array_equal(lvl["n"].to_numpy(), exp.to_numpy())
    # single input scan: the union's branches read materialized levels
    plan = pyr._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") >= 4 or "LogicalRDD" in plan


def test_sketch_stats_contract(spark, sf_dir):
    """HLL + approx-quantile sketches: the contract booleans hold and
    the exact columns equal a pandas recomputation; the plan stays
    JVM-only (builtin sketch aggregates, no Python nodes)."""
    from go_shapefile_spark.operators.sketches import sketch_stats_spark_sql
    from go_shapefile_spark.queries import register_tables

    register_tables(spark, sf_dir)
    df = spark.sql(sketch_stats_spark_sql())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
    got = df.toPandas().set_index("source").sort_index()
    docs = spark.table("documents").toPandas()
    grp = docs.assign(length=docs["text"].str.len()).groupby("source")
    for src, g in grp:
        row = got.loc[src]
        assert row["n_docs"] == len(g)
        assert row["exact_distinct"] == g["text"].nunique()
        assert row["min_len"] == g["length"].min()
        assert row["max_len"] == g["length"].max()
        assert bool(row["hll_ok"]) and bool(row["p50_ok"])


def test_bpe_token_stats_dual_engine_edges(spark):
    """The BPE-ish pre-tokenizer pattern must count identically in both
    engines on escaping-hostile text (backslashes, tabs, contractions,
    doubled quotes) — the backslash-literal seam (H.rx) under test."""
    import duckdb
    import pandas as pd

    from go_shapefile_spark.operators.text import bpe_token_stats_sql

    texts = ["Hello world, it's 42 spark-tokens!", "", "   ", "a'b''c",
             "tab\tnewline\nmix 123abc",
             "don't we'll they're I'm you've it'd",
             "back\\slash and s p a c e s"]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    spark.createDataFrame(pdf).createOrReplaceTempView("bpe_docs")
    got_s = (spark.sql(bpe_token_stats_sql("spark", rel="bpe_docs"))
             .toPandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("bpe_docs", pdf)
    got_d = (con.execute(bpe_token_stats_sql("duck", rel="bpe_docs")).df()
             .sort_values("doc_id").reset_index(drop=True))
    assert got_s.astype(str).equals(got_d.astype(str))
    # sanity: segmentation behaves like a pre-tokenizer
    row0 = got_s.iloc[0]
    assert row0["n_bpe_tokens"] == 10 and row0["n_ws_tokens"] == 5


def test_minhash_stop_shingle_filter_tames_boilerplate(spark):
    """r5 scale finding: on a corpus where every doc shares boilerplate,
    the unfiltered LSH buckets merge (candidates ~ quadratic); the
    max_doc_freq stop-shingle filter must collapse the false candidates
    while still pairing the planted near-duplicates."""
    import go_shapefile_spark.operators.dedup as D
    from go_shapefile_spark.queries import SPARK

    rng = np.random.default_rng(11)
    boiler = " ".join(f"common{j}" for j in range(30))
    rows = []
    for i in range(60):
        uniq = " ".join(np.base_repr(int(v), 36).lower()
                        for v in rng.integers(36**5, 36**6, 12))
        rows.append((i, f"{boiler} {uniq}"))
    # planted near-dup: doc 60 = doc 0 with one unique word changed
    rows.append((60, rows[0][1][:-6] + "edited"))
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("boilerdocs")

    plain = spark.sql(D.minhash_lsh_sql(
        SPARK, rel="boilerdocs", threshold=0.5)).collect()
    filt = spark.sql(D.minhash_lsh_sql(
        SPARK, rel="boilerdocs", threshold=0.5,
        max_doc_freq=0.5)).collect()
    filt_pairs = {(r.doc_a, r.doc_b) for r in filt}
    # the planted pair survives the filter (high Jaccard on the unique
    # tail), and the boilerplate-only false pairs are gone
    assert (0, 60) in filt_pairs
    plain_pairs = {(r.doc_a, r.doc_b) for r in plain}
    # unfiltered: the shared boilerplate inflates Jaccard, so the pair
    # set is strictly larger than the filtered one's true near-dups
    assert len(plain_pairs) > len(filt_pairs)


def test_fingerprint_overlap_pairs_detects_planted_copy(spark):
    """A contiguous copied passage (>= k + window - 1 chars) must pair
    the plagiarist with the source via shared winnowed fingerprints,
    while unrelated high-entropy docs produce no pairs — and the
    doc-frequency guard must not filter away the (rare) copied
    passage's fingerprints."""
    from go_shapefile_spark.operators.text import fingerprint_overlap_pairs_sql
    from go_shapefile_spark.queries import SPARK

    rng = np.random.default_rng(31)

    def noise(n):
        return "".join(np.base_repr(int(v), 36).lower()
                       for v in rng.integers(36**5, 36**6, n))

    passage = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(0, noise(40) + " " + passage + " " + noise(40)),
            (1, noise(40) + " " + passage + " " + noise(40))]
    rows += [(i, noise(90)) for i in range(2, 30)]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .createOrReplaceTempView("plagdocs")
    got = spark.sql(fingerprint_overlap_pairs_sql(
        SPARK, rel="plagdocs", min_shared=3, max_doc_freq=0.1)).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)   # no false pairs


def test_heatmap_matches_numpy_splat_and_conserves_mass(spark):
    from go_shapefile_spark.operators.tiles import heatmap
    rng = np.random.default_rng(11)
    n = 3000
    pdf = pd.DataFrame({"lon": rng.uniform(-180, 180, n),
                        "lat": rng.uniform(-90, 90, n)})
    got = heatmap(spark.createDataFrame(pdf), ppd=1).toPandas()

    # independent numpy splat: dict accumulate over the 3x3 kernel
    kern = {(-1, -1): 1, (-1, 0): 2, (-1, 1): 1, (0, -1): 2, (0, 0): 4,
            (0, 1): 2, (1, -1): 1, (1, 0): 2, (1, 1): 1}
    acc, centered = {}, {}
    for x, y in zip(np.floor(pdf["lon"]).astype(np.int64),
                    np.floor(pdf["lat"]).astype(np.int64)):
        for (dx, dy), w in kern.items():
            acc[(x + dx, y + dy)] = acc.get((x + dx, y + dy), 0) + w
        centered[(x, y)] = centered.get((x, y), 0) + 1
    exp = {k: (v, centered.get(k, 0)) for k, v in acc.items()}
    got_map = {(r.x, r.y): (r.intensity, r.n_centered)
               for r in got.itertuples()}
    assert got_map == exp
    assert got["intensity"].sum() == 16 * n        # no mass lost
    assert got["n_centered"].sum() == n


def test_heatmap_single_point_kernel_shape(spark):
    from go_shapefile_spark.operators.tiles import heatmap
    df = spark.createDataFrame([(0.5, 0.5)], "lon double, lat double")
    rows = {(r.x, r.y): r.intensity for r in heatmap(df).collect()}
    assert rows == {(-1, -1): 1, (-1, 0): 2, (-1, 1): 1, (0, -1): 2,
                    (0, 0): 4, (0, 1): 2, (1, -1): 1, (1, 0): 2, (1, 1): 1}


def _exact_heavy_hitters(items, c):
    n = len(items)
    vc = pd.Series(items).value_counts()
    return {t: int(k) for t, k in vc.items() if k * (c + 1) > n}


@pytest.mark.parametrize("seed,c", [(0, 8), (1, 4), (2, 16)])
def test_heavy_hitters_zipf_matches_exact_threshold(spark, seed, c):
    from go_shapefile_spark.operators.sketches import heavy_hitters
    rng = np.random.default_rng(seed)
    # zipf-ish: a few dominant tokens + long uniform tail, far more
    # distinct items than sketch capacity
    items = (["hot%d" % i for i in range(3) for _ in range(2000 // (i + 1))]
             + ["t%d" % v for v in rng.integers(0, 5000, 6000)])
    rng.shuffle(items)
    exp = _exact_heavy_hitters(items, c)
    assert exp, "fixture must contain heavy hitters"
    df = spark.createDataFrame([(t,) for t in items], "tok string")
    got = {r.tok: r.cnt for r in heavy_hitters(df, capacity=c).collect()}
    assert got == exp


def test_heavy_hitters_adversarial_ordering_and_partitioning(spark):
    from go_shapefile_spark.operators.sketches import heavy_hitters
    # all duplicates adjacent (sorted) vs round-robin shuffled vs one
    # partition: the guarantee must hold under every layout
    items = sorted(["hh"] * 600 + ["t%d" % i for i in range(900)])
    df = spark.createDataFrame([(t,) for t in items], "tok string")
    exp = _exact_heavy_hitters(items, 4)
    for layout in (df.coalesce(1), df.repartition(16),
                   df.repartition(7, "tok")):
        got = {r.tok: r.cnt for r in
               heavy_hitters(layout, capacity=4).collect()}
        assert got == exp == {"hh": 600}


def test_heavy_hitters_capacity_one_and_empty(spark):
    from go_shapefile_spark.operators.sketches import heavy_hitters
    df = spark.createDataFrame([("a",)] * 9 + [("b",)], "tok string")
    got = {r.tok: r.cnt for r in heavy_hitters(df, capacity=1).collect()}
    assert got == {"a": 9}          # 9*2 > 10; b: 1*2 <= 10
    empty = spark.createDataFrame([], "tok string")
    assert heavy_hitters(empty, capacity=4).count() == 0
    with pytest.raises(ValueError):
        heavy_hitters(df, capacity=0)


def test_heavy_hitters_recount_scan_is_jvm(spark):
    from go_shapefile_spark.operators.sketches import heavy_hitters
    df = spark.createDataFrame([("a",)] * 50 + [("b%d" % i,) for i in range(50)],
                               "tok string")
    out = heavy_hitters(df, capacity=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pass 2 (the data-proportional scan) must stay in codegen: the
    # Python sketch stage feeds only the collected candidate literals
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_adaptive_tiles_matches_bruteforce_quadtree(spark):
    from go_shapefile_spark.functions import cells as C
    from go_shapefile_spark.operators.tiles import adaptive_cells_body
    rng = np.random.default_rng(5)
    # dense blob + sparse background forces a mix of leaf depths
    lon = np.concatenate([rng.normal(10, 1.5, 700),
                          rng.uniform(-180, 180, 300)])
    lat = np.concatenate([rng.normal(20, 1.0, 700),
                          rng.uniform(-90, 90, 300)])
    R, K = 7, 25

    # independent recursive top-down reference
    def leaves(ids, r, kx, ky):
        if len(ids) <= K or r == R:
            return {(r, kx, ky): len(ids)}
        out = {}
        n = 1 << (R - r - 1)
        ix = np.clip(((lon[ids] + 180.0) / 360.0 * (1 << R)).astype(np.int64),
                     0, (1 << R) - 1) // n
        iy = np.clip(((lat[ids] + 90.0) / 180.0 * (1 << R)).astype(np.int64),
                     0, (1 << R) - 1) // n
        for cx in (2 * kx, 2 * kx + 1):
            for cy in (2 * ky, 2 * ky + 1):
                sub = ids[(ix == cx) & (iy == cy)]
                if len(sub):
                    out.update(leaves(sub, r + 1, cx, cy))
        return out

    exp = {}
    for (r, kx, ky), n in leaves(np.arange(1000), 0, 0, 0).items():
        cell = (np.int64(r) << C._RES_SHIFT) | C._spread_np(
            np.array([kx]))[0] | (C._spread_np(np.array([ky]))[0] << 1)
        exp[int(cell)] = (r, n)

    pdf = pd.DataFrame({"id": np.arange(1000), "lon": lon, "lat": lat})
    spark.createDataFrame(pdf).createOrReplaceTempView("qt_pts")
    got = {r.cell: (r.res, r.n_points) for r in spark.sql(
        "WITH " + adaptive_cells_body("spark", R, K, pts="qt_pts").lstrip()
    ).collect()}
    assert got == exp
    assert sum(n for _r, n in got.values()) == 1000     # partition of pts
    assert len({r for r, _n in got.values()}) >= 3      # mixed depths


def test_idw_matches_numpy_reference_and_bounds(spark):
    from go_shapefile_spark.operators.tiles import idw_body
    rng = np.random.default_rng(9)
    n = 800
    pdf = pd.DataFrame({
        "lon": rng.uniform(-20, 20, n), "lat": rng.uniform(-10, 10, n),
        "value": np.round(rng.uniform(0, 100, n), 2)})
    # plant a sample exactly on a node center: the cap weight dominates
    pdf.loc[0, ["lon", "lat", "value"]] = (3.5, 4.5, 77.25)
    spark.createDataFrame(pdf).createOrReplaceTempView("idw_pts")
    got = {(r.x, r.y): (r.n_pts, r.idw_micro)
           for r in spark.sql(
               "WITH idw_in AS (SELECT * FROM idw_pts),"
               + idw_body("spark", pts="idw_in")).collect()}

    # independent reference with the same quantization spec
    import math
    px = np.floor(pdf.lon).astype(np.int64)
    py = np.floor(pdf.lat).astype(np.int64)
    v = np.round(pdf.value * 100).astype(np.int64)
    nodes = sorted(set(zip(px, py)))
    exp = {}
    CAP = 10 ** 12
    for (x, y) in nodes:
        sel = (np.abs(px - x) <= 1) & (np.abs(py - y) <= 1)
        d2 = (pdf.lon[sel] - (x + 0.5)) ** 2 + (pdf.lat[sel] - (y + 0.5)) ** 2
        w = np.array([CAP if d == 0.0 else min(CAP, math.floor(1e6 / d))
                      for d in d2], dtype=np.int64)
        num, den = int((w * v[sel]).sum()), int(w.sum())
        exp[(x, y)] = (int(sel.sum()),
                       math.floor(float(num) * 10000.0 / float(den)))
    assert got == exp
    # interpolated value stays inside the sample range (weights >= 0):
    # idw_micro = floor(1e4 * mean cents), values <= 100.00
    for (x, y), (_n, micro) in got.items():
        assert 0 <= micro <= 100_00 * 10_000
    # the planted on-center sample (77.25 -> 7725 cents) dominates
    assert abs(got[(3, 4)][1] - 7725 * 10_000) < 200_000


def test_idw_near_center_sample_does_not_overflow(spark):
    # regression (review finding): a sample within ~3e-7 deg of a node
    # center (d2 tiny but nonzero) must take the clamped cap, not
    # overflow the BIGINT cast under ANSI mode
    from go_shapefile_spark.operators.tiles import idw_body
    pdf = pd.DataFrame({"lon": [2.5 + 1e-9, 2.9], "lat": [7.5, 7.1],
                        "value": [50.0, 10.0]})
    spark.createDataFrame(pdf).createOrReplaceTempView("idw_tiny")
    rows = spark.sql("WITH idw_in AS (SELECT * FROM idw_tiny),"
                     + idw_body("spark", pts="idw_in")).collect()
    by_node = {(r.x, r.y): r for r in rows}
    r = by_node[(2, 7)]
    # the near-center sample carries the cap weight -> mean ~= 50.00
    assert abs(r.idw_micro - 5000 * 10_000) < 10_000


def test_kmv_overlap_estimator_accuracy_controlled(spark):
    """KMV union/intersection estimates on synthetic groups with
    CONTROLLED overlap at realistic cardinality (the gate corpus is
    tiny/full-overlap; this is the statistical check): 3 groups of 8000
    members, pairwise overlaps engineered at ~50%/25%/12.5%."""
    from go_shapefile_spark.operators.sketches import kmv_overlap_sql

    rows = []
    # group A: 0..7999; B: 4000..11999 (50% of A); C: 10000..17999
    # (2000 shared with B, none with A)
    for g, lo in (("a", 0), ("b", 4000), ("c", 10000)):
        rows.extend((g, m) for m in range(lo, lo + 8000))
    spark.createDataFrame(rows, "g string, m long") \
        .createOrReplaceTempView("kmv_members")
    out = {(r.g1, r.g2): r for r in spark.sql(
        "WITH " + kmv_overlap_sql(
            "spark", rel="kmv_members", group="g", member="m",
            k=512, union_tol=0.10, inter_tol=0.12).lstrip()).collect()}
    assert out[("a", "b")].exact_union == 12000
    assert out[("a", "b")].exact_inter == 4000
    assert out[("b", "c")].exact_inter == 2000
    assert out[("a", "c")].exact_inter == 0
    for pair, r in out.items():
        assert r.union_ok and r.inter_ok, (pair, r)


def test_kmv_sketch_is_deterministic_under_partitioning(spark):
    from go_shapefile_spark.operators.sketches import kmv_overlap_sql
    rows = [(f"g{m % 2}", m % 500) for m in range(4000)]
    df = spark.createDataFrame(rows, "g string, m long")
    outs = []
    for layout in (df.coalesce(1), df.repartition(17, "m")):
        layout.createOrReplaceTempView("kmv_det")
        outs.append(sorted(map(tuple, spark.sql(
            "WITH " + kmv_overlap_sql(
                "spark", rel="kmv_det", group="g",
                member="m").lstrip()).collect())))
    assert outs[0] == outs[1]
