from catears_tpu.runtime.recognizer import (
    Recognizer,
    Utterance,
    decode_wav_file,
)
