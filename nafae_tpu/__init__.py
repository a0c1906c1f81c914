"""nafae_tpu — TPU-native weakly-supervised video object grounding.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of jshi31/NAFAE
("Not All Frames Are Equal", CVPR 2019): word-region similarity grounding on
YouCook2/RoboWatch with MIL ranking, contextual-similarity and visual-clustering
losses — designed TPU-first (see docs/MATH.md and SURVEY.md).

Note on provenance: the reference mount /root/reference was empty at build time
(SURVEY.md provenance warning), so docstrings cite SURVEY.md sections / the paper
instead of reference file:line.
"""

__version__ = "0.1.0"
