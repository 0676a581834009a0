from .blstm import BiLSTM, LSTM
from .tasnet import ConvTasNet
from .upit import UPitBlstm, UPitConv
from .vq import GumbelSoftmax, VectorQuantizer, gumbel_softmax, nearest_code_indices
from .relpos import CodePrior, RelativeSelfAttention
from .vqvae import VqVaeCodebook, VqVaeGumbel, VqVaeT2, VqVaeT3, VqVaeT3Tok

__all__ = [
    "LSTM",
    "BiLSTM",
    "UPitBlstm",
    "UPitConv",
    "ConvTasNet",
    "GumbelSoftmax",
    "VectorQuantizer",
    "gumbel_softmax",
    "nearest_code_indices",
    "VqVaeCodebook",
    "VqVaeGumbel",
    "VqVaeT2",
    "VqVaeT3",
    "VqVaeT3Tok",
    "CodePrior",
    "RelativeSelfAttention",
]
