from glimpseprune_tpu.models.llava.clip import CLIPVisionTower
from glimpseprune_tpu.models.llava.gp_model import LlavaConfig, Llava_GP

__all__ = ["CLIPVisionTower", "LlavaConfig", "Llava_GP"]
