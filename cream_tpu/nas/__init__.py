from cream_tpu.nas.evolution import EvolutionSearcher
