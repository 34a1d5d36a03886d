from .image_encoder import ImageEncoderViT, VIT_VARIANTS
from .tiny_vit import TinyViT
from .prompt_encoder import PromptEncoder
from .mask_decoder import MaskDecoder, TwoWayTransformer
from .mask_decoder_hq import MaskDecoderHQ
from .sam_model import Sam, build_sam
from .predictor import SamPredictor
from .auto_mask_generator import SamAutomaticMaskGenerator
from .factory import build_predictor
