"""metabuli_work_tpu — TPU-native metagenomic classification framework.

A from-scratch JAX/XLA implementation of the Metabuli metamer method
(reference: LunaJang/Metabuli_work, C++17): joint amino-acid + DNA
k-mers ("metamers") extracted from six reading frames, probed against a
sorted reference index, scored by consecutive-match paths, and assigned
taxonomy via LCA.  The compute path is batched array code on TPU; the
runtime around it (IO, taxonomy, reporting, CLI) is host code.

Subpackages:
  ops       encode/match kernels (JAX) + numpy oracles + masking
  index     DB build, native sorted-array layout, reference-format codec
  taxonomy  NCBI taxdump, O(1) vectorized LCA, rank tables
  classify  pipeline orchestration + per-read scoring (Taxonomer)
  report    classification TSV / Kraken report / Krona writers
  parallel  device-mesh sharding of the index + collectives
  io        FASTA/FASTQ readers
"""

__version__ = "0.1.0"
