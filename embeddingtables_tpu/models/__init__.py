"""Model families built on the embedding engine.

The reference is the kernel library *under* a DLRM implementation
(`/root/reference/README.md:174-176`: the `PreallocationStrategy(prependrows)`
design exists to fuse DLRM's bottom-MLP concat); the DLRM model itself is the
flagship here (BASELINE.md config 4).
"""
from .dlrm import (DLRM, DLRMConfig, dlrm_small_config, init_dlrm,
                   make_train_step, make_eval_step)
from .dcn import (DCN, DCNConfig, dcn_small_config, init_dcn)
from .dcn import make_train_step as make_dcn_train_step
from .dcn import make_eval_step as make_dcn_eval_step
from .deepfm import (DeepFM, DeepFMConfig, deepfm_small_config, fuse_deepfm,
                     init_deepfm, unfuse_deepfm)
from .deepfm import make_train_step as make_deepfm_train_step
from .deepfm import make_eval_step as make_deepfm_eval_step
from .two_tower import (TwoTower, TwoTowerConfig, build_item_index,
                        init_two_tower, retrieve)

__all__ = ["DLRM", "DLRMConfig", "dlrm_small_config", "init_dlrm",
           "make_train_step", "make_eval_step",
           "DCN", "DCNConfig", "dcn_small_config", "init_dcn",
           "make_dcn_train_step", "make_dcn_eval_step",
           "DeepFM", "DeepFMConfig", "deepfm_small_config", "init_deepfm",
           "fuse_deepfm", "unfuse_deepfm",
           "make_deepfm_train_step", "make_deepfm_eval_step",
           "TwoTower", "TwoTowerConfig", "init_two_tower",
           "build_item_index", "retrieve"]
