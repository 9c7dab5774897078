from catears_tpu.graph.fst import DeltaLmFst, FlatFst, LmFst
