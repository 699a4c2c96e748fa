"""Global constants of the OCR stack.

Numerics mirror the reference (`/root/reference/const.py:1-15`,
`/root/reference/util_func.py:5-9`) so that imported `model.pt` / `model3.pt`
weights and the wire protocols stay compatible, but everything here is a
fresh TPU-first definition (static shapes, powers-of-two-friendly tiling).
"""

# Chinese-Remainder-Theorem moduli used to code UTF-32 codepoints.
# Three coprime moduli near 2**10; the product (~1.308e9) bounds the code
# space and still fits in int32.
MODULO_LIST = (1091, 1093, 1097)
MODULO_PRODUCT = MODULO_LIST[0] * MODULO_LIST[1] * MODULO_LIST[2]

# Largest valid codepoint the codec will accept (UTF-32 + private markers).
MAX_CODEPOINT = 0x3FFFF

# Detector geometry: 768x768 input tile, 4x downsampled output maps.
IMAGE_WIDTH = 768
IMAGE_HEIGHT = 768
SCALE = 4
MAP_WIDTH = IMAGE_WIDTH // SCALE    # 192
MAP_HEIGHT = IMAGE_HEIGHT // SCALE  # 192

# Per-character feature embedding size produced by the detector.
FEATURE_DIM = 100

# Extra flag dims appended to the 100-d feature for the transformer encoder:
# vertical, ruby-base, ruby-text, space, emphasis, newline.
ENCODER_ADD_DIM = 6
ENCODER_DIM = FEATURE_DIM + ENCODER_ADD_DIM  # 106

# Transformer sequence caps (static shapes on TPU).
MAX_ENCODER_LEN = 400
MAX_DECODER_LEN = 400

# Special decoder tokens.
DECODER_PAD = 0
DECODER_SOT = 1
DECODER_EOT = 2
DECODER_MSK = 3

# Ruby (furigana) markers in decoded text streams (interlinear annotation).
RUBY_BASE_START = 0xFFF9   # start of annotated base text
RUBY_TEXT_START = 0xFFFA   # start of annotation (ruby) text
RUBY_END = 0xFFFB          # end of annotation

# Detector output channel layout (9 "heatmap" channels + 100 feature chans).
CH_KEYMAP = 0
CH_SIZE_W = 1
CH_SIZE_H = 2
CH_TEXTLINE = 3
CH_SEPARATOR = 4
CH_CODE1 = 5   # ruby text
CH_CODE2 = 6   # ruby base
CH_CODE4 = 7   # emphasis
CH_CODE8 = 8   # space
NUM_HEATMAP_CH = 9
