from diffndm_tpu.data.pdb import PDBStructure, parse_pdb  # noqa: F401
from diffndm_tpu.data.pocket import (get_pocket_from_ligand,  # noqa: F401
                                     prepare_pocket)
