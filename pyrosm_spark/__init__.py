"""pyrosm_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch rebuild of the query capabilities of pyrosm/pyrosm
(OSM PBF -> GeoDataFrame reader) as a distributed Spark engine:

* node->way->relation topology built as shuffle joins over parquet/Iceberg
  tables (``operators.network``, ``operators.layers``, ``operators.relations``)
* a filter compiler that lowers pyrosm's custom_filter forms (dict /
  regex-dict / Overpass bracket strings) into Catalyst ``Column`` predicates
  (``functions.filters``)
* vectorized tile encoding (hierarchical quad cells), point-in-polygon and
  cell-local kNN spatial joins with explicit skew handling
  (``functions.tiles``, ``operators.spatial_join``)
* image-payload plumbing (decode / phash / PSNR) as Arrow-batched pandas
  UDFs (``functions.image_np``, ``operators.multimodal``)
* training-data pipeline ops: dedup (exact / minhash-LSH / simhash /
  ngram-jaccard / embedding-cosine), ANN similarity search, text analysis
  (``operators.dedup``, ``operators.similarity``, ``operators.text``)
* checkpoint / lineage manifests for resumable multi-stage jobs
  (``plans.checkpoint``)

Reference semantics are cited per-function as ``file:line`` into
``/root/reference`` (pyrosm v0.11.x). No code is copied from the
reference; the execution model is Spark DataFrames + Catalyst, not a
port of its Cython engine.
"""

__version__ = "0.1.0"

from pyrosm_spark.api import OSM  # noqa: F401
from pyrosm_spark.session import get_spark  # noqa: F401
