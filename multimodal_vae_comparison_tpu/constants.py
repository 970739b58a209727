"""Numeric constants shared across the framework.

Mirrors the role of ``Constants`` in the reference toolkit
(multimodal_compare/utils.py:253-259) with TPU-appropriate values.
"""
import math

ETA = 1e-6        # variance / probability floor
EPS = 1e-8        # precision floor for product-of-experts
LOG2 = math.log(2.0)
LOG2PI = math.log(2.0 * math.pi)
# Fixed decoder likelihood scale used by all image/sequence decoders
# (reference convention: every Dec_* returns (mean, 0.75),
#  multimodal_compare/models/decoders.py:96-98).
DEC_SCALE = 0.75
# 27-symbol character alphabet used for text one-hot encoding
# (reference: multimodal_compare/utils.py:408).
ALPHABET = " abcdefghijklmnopqrstuvwxyz"
