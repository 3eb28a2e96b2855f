"""torchvision import shim for the parity harness.

Provides the attribute surface the reference imports at module scope
(``transforms``, ``models`` — ``utils/transforms_factory.py:12``,
``utils/loss_factory.py:11``).  Anything that would need pretrained weights
or the real library raises at call time; the parity configs avoid those
paths (albumentations backend, no vgg_perceptual term).
"""

from . import models, transforms  # noqa: F401
