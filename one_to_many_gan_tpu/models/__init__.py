"""Model families: generator, discriminator, mapping network, style extractor."""

from one_to_many_gan_tpu.models.blocks import ModulatedResnetBlock, ResnetBlock
from one_to_many_gan_tpu.models.discriminator import Discriminator, StyleExtractor
from one_to_many_gan_tpu.models.generator import Generator, generator_arithmetic
from one_to_many_gan_tpu.models.mapping import (
    MappingNetwork,
    StyleRngs,
    apply_domain,
    sample_style_rngs,
)

__all__ = [
    "Discriminator",
    "Generator",
    "MappingNetwork",
    "ModulatedResnetBlock",
    "ResnetBlock",
    "StyleExtractor",
    "StyleRngs",
    "apply_domain",
    "generator_arithmetic",
    "sample_style_rngs",
]
