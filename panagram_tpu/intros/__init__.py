"""Introgression calling subsystem.

Re-implementation of the reference's panagram/introgressions/ package
(~3,600 LoC: simulator, caller, postprocessor, scorer, visualizer, runner —
SURVEY §2.5), driven by the same 4-section YAML config and group.tsv, over
the panagram_tpu Index read API.  Heatmaps/plots use matplotlib (plotly is
not available in this environment).
"""
