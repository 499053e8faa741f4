from .esfnet import ESFNet, ESFNetWithDS, DenseEncoder, DenseDecoder, get_sizes

__all__ = ["ESFNet", "ESFNetWithDS", "DenseEncoder", "DenseDecoder", "get_sizes"]
