"""PSY feature layer (the fork's psychovisual additions, SURVEY.md §2.6):
variance boost, psy-rd, tunes, sharpness, noise normalization, ..."""
