"""osmgraft — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of Jahor/osm-tools
(reference mirrored at /root/reference, C, single-threaded) as a library
of composable DataFrame operators: hierarchical cell index, exact
fixed-point point-in-polygon spatial join, kNN, zoom-pyramid tiling,
membership closure, snapshot/checkpoint store, plus web-scale
training-data operators (dedup, ANN, text stats, multimodal plumbing).
"""

__version__ = "0.1.0"
