"""GATv2 model entry (parity: ``kgcnn/literature/GATv2.py``): the v2
attention head of Brody et al. within the shared GAT scaffold
(``models/gat.py``). Separate module so the registry's
``{module_name: "GATv2", class_name: "make_model"}`` resolves to v2."""
from .gat import GATModel, make_model_v2 as make_model, model_default  # noqa: F401
