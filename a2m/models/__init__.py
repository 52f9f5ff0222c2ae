from a2m.models import losses
from a2m.models.discriminator import (Discriminator, SelfAttention_D,
                                      aux_cross_entropy)
from a2m.models.generator import (Generator, SelfAttention_G,
                                  forward_with_losses)

__all__ = ['losses', 'Discriminator', 'SelfAttention_D', 'aux_cross_entropy',
           'Generator', 'SelfAttention_G', 'forward_with_losses']
