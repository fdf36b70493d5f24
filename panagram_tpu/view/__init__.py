"""Pan-genome browser.

Functional equivalent of the reference's Plotly Dash viewer (reference
panagram/view.py, 2967 LoC): three tabs (Pangenome / Anchor genome /
Chromosome) over the same read-side index API.  Re-designed as a
dependency-free thin client — a stdlib HTTP server rendering matplotlib
figures — because dash/plotly are not available in this environment.
"""
