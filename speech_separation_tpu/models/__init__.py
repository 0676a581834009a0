from .blstm import BiLSTM, LSTM
from .upit import UPitBlstm, UPitConv

__all__ = ["LSTM", "BiLSTM", "UPitBlstm", "UPitConv"]
