from .snake import snake
from .masks import logcosh, generate_mask_ste, generate_mask_hard, generate_mask_ste_moe
