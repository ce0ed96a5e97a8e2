"""Renderers (the "models"): stage-1 shape and stage-2 material."""

name2renderer = {}


def register_renderer(name):
    def deco(cls):
        name2renderer[name] = cls
        return cls
    return deco
