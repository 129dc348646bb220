from apr_tpu.utils.timer import Timer, AverageMeter, MinTimer

__all__ = ["Timer", "AverageMeter", "MinTimer"]
