class Annotation:  # placeholder, replaced below
    pass
