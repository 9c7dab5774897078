from catears_tpu.io.binfmt import (
    NnetSpec,
    LayerSpec,
    RawFst,
    read_mat0,
    read_nnet,
    read_nnet_file,
    read_pkfst,
    read_pkfst_file,
    read_vec0,
    read_vec0_file,
    write_mat0,
    write_nnet,
    write_pkfst,
    write_vec0,
)
from catears_tpu.io.config import Configuration
from catears_tpu.io.openfst import ConstFst, read_const_fst_file, write_const_fst
from catears_tpu.io.symbols import SymbolTable
from catears_tpu.io.wav import (
    WaveFormat,
    WaveReader,
    iter_wav_chunks,
    read_16k_pcm,
    read_pcm_header,
    read_scp,
)
