from .evaluate import LutEvaluator, eval_dataset, process_single_image, run_test
from .finetune import finetune
from .train import cosine_lr, make_optimizer, make_train_step, train
from .transfer import cache_lut, lut_grid, transfer_to_luts

__all__ = [
    "LutEvaluator",
    "eval_dataset",
    "process_single_image",
    "run_test",
    "finetune",
    "cosine_lr",
    "make_optimizer",
    "make_train_step",
    "train",
    "cache_lut",
    "lut_grid",
    "transfer_to_luts",
]
