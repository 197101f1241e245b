"""Model package: importing registers all backbones/branches/heads."""

from dist_tpu.models.base import models  # noqa: F401
from dist_tpu.models.backbones import resnet3d  # noqa: F401
from dist_tpu.models.branches import tada  # noqa: F401
from dist_tpu.models.branches import tada_convnext  # noqa: F401
from dist_tpu.models.backbones import video_transformer  # noqa: F401
from dist_tpu.models.backbones import slowfast  # noqa: F401
from dist_tpu.models.backbones import s3dg  # noqa: F401
from dist_tpu.models.backbones import vit_video  # noqa: F401
from dist_tpu.models.heads import contrastive  # noqa: F401
from dist_tpu.models.heads import transformer_head  # noqa: F401
from dist_tpu.models.backbones import localization  # noqa: F401
from dist_tpu.models.heads import bmn  # noqa: F401
