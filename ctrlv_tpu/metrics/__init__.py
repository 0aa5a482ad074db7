from .iou import binary_mask_iou, binary_mask_iou_batch
from .fandj import (db_eval_iou, db_eval_boundary, f_measure,
                    pil_luma_uint8, stage1_frame_f_measure)
from .image import ssim, psnr
from .davis import DAVISEvaluation
from .lpips import (LPIPS, lpips_distance, lpips_init_params,
                    lpips_torch_to_flax, load_lpips_torch_weights)

__all__ = [
    "binary_mask_iou",
    "binary_mask_iou_batch",
    "db_eval_iou",
    "db_eval_boundary",
    "f_measure",
    "pil_luma_uint8",
    "stage1_frame_f_measure",
    "ssim",
    "psnr",
    "DAVISEvaluation",
    "LPIPS",
    "lpips_distance",
    "lpips_init_params",
    "lpips_torch_to_flax",
    "load_lpips_torch_weights",
]
