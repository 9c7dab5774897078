from catears_tpu.frontend.cmvn import CMVNStream, OnlineCMVN
from catears_tpu.frontend.fbank import (
    Fbank,
    FbankStream,
    fbank_from_frames,
    fbank_from_wave,
    frame_signal,
    num_frames,
)
