"""PySpark-native spatial-join + tiling engine (go-shapefile graft).

Public API (lazily imported so ``import go_shapefile_spark`` stays cheap
and works without a live SparkSession):

Sources
    read_shapefile_df / read_shapefile_dir — shapefile → DataFrame
    ShapefileDataSource — ``spark.read.format("shapefile")`` (register
    with ``spark.dataSource.register``)
    SnapshotTable — Iceberg-style snapshot table (append / time travel /
    incremental / compact / expire)
Operators
    spatial_join, PreparedCover — cell-cover broadcast join + PIP refine
    knn_radius, knn_exact — cell-local / exact k nearest neighbors
    tile_counts, tile_pyramid, rasterize_features, vectorize_raster
    heatmap, simplify_features, geom_measures, geodesic_measures
    dbscan — grid-accelerated density clustering
    heavy_hitters — Misra-Gries sketch + exact candidate recount
    vector_tiles, vector_tiles_lines, vector_tile_pyramid,
    vector_tile_pyramid_lines — Sutherland-Hodgman / Liang-Barsky
    tile clipping (the vector-tile pipeline)
    render_heatmap_tiles — per-tile PNG rendering (tile server)
    decode_resize_featurize, augment_images, frame_sample,
    audio_features, audio_resample — multimodal
    (image / video / audio) binary-column operators
    learn_bpe — distributed BPE tokenizer training
Functions
    to_wkt, features_to_geojson, features_to_geojson_jvm,
    geojson_to_features, geohash_np, geohash_sql
Pinning
    fresh_pins, release_pins — pinned-relation materialization
    (executor-local checkpoint or durable storage scan-back)
Session
    get_spark — tuned local session factory
"""

from __future__ import annotations

_LAZY = {
    "read_shapefile_df": "go_shapefile_spark.sources.shapefile",
    "read_shapefile_dir": "go_shapefile_spark.sources.shapefile",
    "ShapefileDataSource": "go_shapefile_spark.sources.datasource",
    "SnapshotTable": "go_shapefile_spark.sources.table_format",
    "spatial_join": "go_shapefile_spark.operators.spatial_join",
    "PreparedCover": "go_shapefile_spark.operators.spatial_join",
    "knn_radius": "go_shapefile_spark.operators.knn",
    "knn_exact": "go_shapefile_spark.operators.knn",
    "tile_counts": "go_shapefile_spark.operators.tiles",
    "tile_pyramid": "go_shapefile_spark.operators.tiles",
    "rasterize_features": "go_shapefile_spark.operators.tiles",
    "vectorize_raster": "go_shapefile_spark.operators.tiles",
    "decode_resize_featurize": "go_shapefile_spark.operators.multimodal",
    "frame_sample": "go_shapefile_spark.operators.multimodal",
    "audio_features": "go_shapefile_spark.operators.multimodal",
    "audio_resample": "go_shapefile_spark.operators.multimodal",
    "augment_images": "go_shapefile_spark.operators.multimodal",
    "image_quality_stats": "go_shapefile_spark.operators.multimodal",
    "video_fingerprint": "go_shapefile_spark.operators.multimodal",
    "video_neardup_pairs": "go_shapefile_spark.operators.multimodal",
    "learn_bpe": "go_shapefile_spark.operators.bpe_train",
    "heatmap": "go_shapefile_spark.operators.tiles",
    "simplify_features": "go_shapefile_spark.operators.geometry",
    "geom_measures": "go_shapefile_spark.operators.geometry",
    "geodesic_measures": "go_shapefile_spark.operators.geometry",
    "dbscan": "go_shapefile_spark.operators.clustering",
    "heavy_hitters": "go_shapefile_spark.operators.sketches",
    "vector_tiles": "go_shapefile_spark.operators.vector_tiles",
    "vector_tiles_lines": "go_shapefile_spark.operators.vector_tiles",
    "vector_tile_pyramid": "go_shapefile_spark.operators.vector_tiles",
    "vector_tile_pyramid_lines":
        "go_shapefile_spark.operators.vector_tiles",
    "render_heatmap_tiles": "go_shapefile_spark.operators.render",
    "connected_components": "go_shapefile_spark.operators.graph",
    "geohash_np": "go_shapefile_spark.functions.cells",
    "geohash_sql": "go_shapefile_spark.functions.cells",
    "to_wkt": "go_shapefile_spark.functions.wkt",
    "features_to_geojson": "go_shapefile_spark.functions.geojson",
    "features_to_geojson_jvm": "go_shapefile_spark.functions.geojson",
    "geojson_to_features": "go_shapefile_spark.functions.geojson",
    "fresh_pins": "go_shapefile_spark.operators.pinning",
    "release_pins": "go_shapefile_spark.operators.pinning",
    "get_spark": "go_shapefile_spark.session",
}

__all__ = sorted(_LAZY)


def __getattr__(name: str):
    mod = _LAZY.get(name)
    if mod is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), name)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
