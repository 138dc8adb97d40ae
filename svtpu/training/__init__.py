from svtpu.training.schedules import temperature_schedule
from svtpu.training.trainer import Trainer, TrainState
