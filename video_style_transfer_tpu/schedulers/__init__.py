from video_style_transfer_tpu.schedulers.ddpm import (  # noqa: F401
    add_noise, make_schedule, velocity_target)
from video_style_transfer_tpu.schedulers.euler import (  # noqa: F401
    euler_step, euler_timetable, scale_model_input)
from video_style_transfer_tpu.schedulers.dpm import (  # noqa: F401
    dpm_step, dpm_timetable)
