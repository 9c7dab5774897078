from catears_tpu.decode.beam import BeamConfig, BeamState, FrameTrace
from catears_tpu.decode.decoder import Decoder, decode_batch
from catears_tpu.decode.hyp import HostTrace, backtrace, best_path
from catears_tpu.decode.oracle import Hypothesis, OracleDecoder
