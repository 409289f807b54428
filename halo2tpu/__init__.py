"""halo2tpu — a TPU-native Halo2-style PLONKish proving framework.

A from-scratch reimplementation of the capabilities of
anon-aadhaar/anon-aadhaar-halo2 (and the PSE halo2 proving stack it sits on),
designed TPU-first: the polynomial/commitment compute path runs as vectorized
JAX/XLA programs (with Pallas kernels for hot ops), sharded over device meshes
with jax.sharding; the protocol layer (transcript, SHPLONK bookkeeping, keygen)
runs on the host.

Layering (mirrors SURVEY.md §1, built TPU-native):
  fields/   BN254 Fr/Fq arithmetic: host (python int) + JAX (16-bit-limb Montgomery)
  curves/   G1/G2 point ops + BN254 pairing (host) + JAX Jacobian batch ops
  ops/      NTT, Pippenger MSM, keccak256, Poseidon
  plonk/    circuit IR, keygen, prover, SHPLONK multiopen, transcript,
            mock prover, verifier (faithful port of the reference's
            solidity_verifier_contract/contract.sol semantics)
  gadgets/  flex-gate / range / big-uint / RSA / SHA-256 gadget layer
  circuits/ the Anon-Aadhaar circuits (signal, timestamp, conditional
            secrets, nullifier, RSA-SHA256, composite QR verifier)
  parallel/ multi-chip sharding (mesh NTT/MSM)
"""

__version__ = "0.1.0"
