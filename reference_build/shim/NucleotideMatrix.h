// Shim: NucleotideMatrix lives in SubstitutionMatrix.h here.
#ifndef SHIM_NUCLEOTIDEMATRIX_H
#define SHIM_NUCLEOTIDEMATRIX_H

#include "SubstitutionMatrix.h"

#endif
