from .likelihood import LikelihoodModel, SingleEndModel, PairedEndModel
