"""Model layer: body model, backbones, regressors, heads, full WHMR graph."""

from whmr_tpu.models.graphormer import GraphormerBodyNetwork  # noqa: F401
from whmr_tpu.models.heads import DepthHead, IUVHead, TzHead  # noqa: F401
from whmr_tpu.models.hmr import HMR  # noqa: F401
from whmr_tpu.models.maf import MAFExtractor  # noqa: F401
from whmr_tpu.models.regressor import (  # noqa: F401
    BodyConsts,
    GlobalOrientRegressor,
    Regressor,
    body_consts_from_assets,
)
from whmr_tpu.models.resnet import (  # noqa: F401
    CamCalibNet,
    PoseResNetEncoder,
    ResNetBackbone,
)
from whmr_tpu.models.smpl import (  # noqa: F401
    SMPLOutput,
    SMPLParams,
    smpl_forward,
    smpl_params_from_assets,
)
from whmr_tpu.models.vit import ViTBackbone  # noqa: F401
from whmr_tpu.models.whmr import WHMR  # noqa: F401
