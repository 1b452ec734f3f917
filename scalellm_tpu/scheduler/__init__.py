from scalellm_tpu.scheduler.continuous_scheduler import (
    ContinuousScheduler,
    SchedulerOptions,
)
from scalellm_tpu.scheduler.response_handler import ResponseHandler

__all__ = ["ContinuousScheduler", "SchedulerOptions", "ResponseHandler"]
