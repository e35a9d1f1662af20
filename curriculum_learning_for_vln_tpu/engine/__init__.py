"""Training engines (ref: tasks/R2R-judy/src/engine/__init__.py)."""
from .auto_curriculum import AutoCurriculum, Exp3S
from .checkpoint import load_checkpoint, save_checkpoint
from .curriculum import NaiveCurriculum, SelfPacedCurriculum, spcl_update_lambda, spcl_update_weight
from .evaluator import Evaluation
from .loop import build_eval_rollout, build_train_step, make_optimizer, run_eval, write_results
from .pretrain import (VLNBertPretrainer, make_clr2r_rounds, pretrain_batches,
                       score_difficulty)
from .self_train import build_backtranslation_step, pretrain_speaker, self_train
from .trainer import ClassicTrainer, check_the_code, dedup_by_path

__all__ = [
    "ClassicTrainer", "NaiveCurriculum", "SelfPacedCurriculum", "Evaluation",
    "check_the_code", "dedup_by_path", "build_train_step", "build_eval_rollout",
    "make_optimizer", "run_eval", "save_checkpoint", "load_checkpoint",
    "spcl_update_weight", "spcl_update_lambda", "self_train",
    "pretrain_speaker", "build_backtranslation_step", "write_results",
    "VLNBertPretrainer", "pretrain_batches", "score_difficulty", "make_clr2r_rounds",
    "AutoCurriculum", "Exp3S",
]
