from catears_tpu.am.model import AcousticModel, AMStream
from catears_tpu.am.nnet import build_nnet, nnet_forward
