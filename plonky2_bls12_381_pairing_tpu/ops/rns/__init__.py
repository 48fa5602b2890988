"""RNS (residue number system) arithmetic tier — see rns_constants.py.

Modules:
  fp     — core Fp ops: channel arithmetic, RNS Montgomery reduction (REDC),
           Fermat inverse, zero/equality predicates, host encode/decode
  tower  — Fq2/Fq6/Fq12 on RNS channels (lazy value-tracked accumulation)
  lines  — G2 line-evaluation steps for the Miller loop
"""
