"""Host-side chemistry oracle.

The reference delegates all chemistry to RDKit/OpenBabel C++ (molecule
building: analysis/molecule_builder.py; metrics: analysis/metrics.py).
Neither library ships in this environment, so this package implements the
required capabilities from scratch on top of numpy/networkx:

- distance-table bond perception (``bonds``), equivalent to the reference's
  EDM path (molecule_builder.py:100-136);
- a light molecular graph type with implicit-H/valence model, ring
  perception and aromaticity (``mol``);
- sanitization/validity/connectivity filters (``sanitize``);
- physico-chemical descriptors: Wildman-Crippen LogP, Ertl TPSA, H-bond
  donor/acceptor counts, rotatable bonds (``descriptors``);
- QED (Bickerton 2012), synthetic-accessibility score (Ertl-style),
  Lipinski rule-of-five (``qed``, ``sa``, ``lipinski`` helpers in
  ``properties``);
- Morgan-style fingerprints + Tanimoto diversity (``fingerprints``);
- SDF/XYZ/PDB I/O (``io``).

When RDKit *is* importable, ``metrics`` transparently prefers it.
"""

from diffndm_tpu.chem.mol import Molecule  # noqa: F401
from diffndm_tpu.chem.bonds import build_molecule  # noqa: F401
