"""tilecloud_chain_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of the reference
``camptocamp/tilecloud-chain`` (studied read-only at ``/root/reference/``) as
idiomatic Spark DataFrame transforms:

- WMTS tile-pyramid grid math (z/x/y, metatiles, bbox->range enumeration) as
  pure Column expressions (``functions.gridmath``),
- dense + sparse tile enumeration as distributed ``spark.range`` jobs with
  driver-side interval planning (``sources.enumerate``),
- per-zoom geometry-restriction filters as vectorized numpy predicates inside
  Arrow-batched pandas UDFs (``operators.filters``; geometry kernel in
  ``geometry``),
- metatile split / hash-drop / dimension fan-out / WMTS path layout
  (``operators.metatile``, ``operators.filters``, ``plans.wmts``),
- image payload path (PNG codec in numpy+zlib, PSNR, phash) in
  ``functions.image``,
- spatial join / kNN / cell index extensions in ``operators.spatial``,
- dedup / similarity / text-analysis pipeline operators in ``operators.dedup``,
  ``operators.similarity``, ``operators.text``,
- checkpoint + lineage + resume in ``checkpoint``.

Architecture is DataFrame/Catalyst-first: the reference's row-at-a-time async
pipeline (``/root/reference/tilecloud_chain/__init__.py:2311-2396``) becomes a
linear chain of DataFrame transforms; its hand-ordered physical tricks (sparse
enumeration, drop-before-split) become plan-time pruning and explicit
transform ordering (see SURVEY.md §4).
"""

__version__ = "0.1.0"
