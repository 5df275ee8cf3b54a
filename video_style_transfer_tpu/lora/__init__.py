from video_style_transfer_tpu.lora.unzip import (  # noqa: F401
    apply_unzip_lora,
    composed_delta,
    cone_columns,
    cone_matrix,
    dual_linear,
    init_unzip_lora_params,
    init_unzip_lora_state,
    mergers_similarity,
    select_columns,
)
