from .photometric import augment_batch, augment_sample
from .styleaug import StyleAugmentor, load_style_stats

__all__ = ["augment_batch", "augment_sample", "StyleAugmentor", "load_style_stats"]
