from .image_encoder import ImageEncoderViT, VIT_VARIANTS
from .prompt_encoder import PromptEncoder
from .mask_decoder import MaskDecoder, TwoWayTransformer
from .sam_model import Sam, build_sam
from .predictor import SamPredictor
