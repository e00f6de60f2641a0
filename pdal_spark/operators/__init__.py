"""Operator library: each module re-expresses a family of reference
stages (PDAL filters/readers/writers) as DataFrame -> DataFrame
functions. See SURVEY.md §2 for the stage-by-stage mapping."""
