// Shim: BaseMatrix / SubstitutionMatrix / ProbabilityMatrix /
// NucleotideMatrix with the members Metabuli's masking path touches
// (aa2num, num2aa, alphabetSize, probMatrixPointers, hardMaskTable).
#ifndef SHIM_SUBSTITUTIONMATRIX_H
#define SHIM_SUBSTITUTIONMATRIX_H

#include <cmath>
#include <cstring>

#include <string>

class BaseMatrix {
public:
    static std::string unserializeName(const char *name) {
        return std::string(name);
    }

    int alphabetSize;
    char num2aa[32];
    unsigned char aa2num[256];
    double **probMatrix;

    BaseMatrix() : alphabetSize(0), probMatrix(NULL) {
        memset(num2aa, 0, sizeof(num2aa));
        memset(aa2num, 0, sizeof(aa2num));
    }
    virtual ~BaseMatrix() {
        if (probMatrix) {
            delete[] probMatrix[0];
            delete[] probMatrix;
        }
    }
};

class SubstitutionMatrix : public BaseMatrix {
public:
    SubstitutionMatrix(const char *filename, float bitFactor, float bias) {
        (void)filename; (void)bitFactor; (void)bias;
    }
};

class NucleotideMatrix : public BaseMatrix {
public:
    NucleotideMatrix(const char *filename, float bitFactor, float bias) {
        (void)filename; (void)bitFactor; (void)bias;
        // ACGT + X(mask/ambiguous); matches mmseqs's nucleotide alphabet
        const char *alpha = "ACGTX";
        alphabetSize = 5;
        memcpy(num2aa, alpha, 5);
        for (int i = 0; i < 256; ++i) {
            aa2num[i] = 4;
        }
        const char *low = "acgtx";
        for (int i = 0; i < 5; ++i) {
            aa2num[(unsigned char)alpha[i]] = (unsigned char)i;
            aa2num[(unsigned char)low[i]] = (unsigned char)i;
        }
        aa2num[(unsigned char)'U'] = aa2num[(unsigned char)'u'] = 3;
        aa2num[(unsigned char)'N'] = aa2num[(unsigned char)'n'] = 4;
        // +1/-1 uniform-frequency nucleotide model at its exact
        // ungapped lambda (sum_ab p_a p_b e^{lambda*s_ab} = 1 gives
        // e^lambda = 3): likelihood ratio 3 for a match, 1/3 for a
        // mismatch, 0 for ambiguous (N never part of a repeat).  The
        // REAL mmseqs matrix is unknowable here (empty submodule); this
        // model is shared verbatim with the framework's native masker
        // (native/tantan_mask.cpp) so masked builds stay comparable
        // k-mer-for-k-mer (tests/test_golden_matrix.py mask cells).
        probMatrix = new double *[alphabetSize];
        probMatrix[0] = new double[alphabetSize * alphabetSize];
        for (int i = 1; i < alphabetSize; ++i) {
            probMatrix[i] = probMatrix[i - 1] + alphabetSize;
        }
        for (int i = 0; i < alphabetSize; ++i) {
            for (int j = 0; j < alphabetSize; ++j) {
                if (i == 4 || j == 4) {
                    probMatrix[i][j] = 0.0;   // N never aligns in a repeat
                } else if (i == j) {
                    probMatrix[i][j] = 3.0;
                } else {
                    probMatrix[i][j] = 1.0 / 3.0;
                }
            }
        }
    }
};

class ProbabilityMatrix {
public:
    explicit ProbabilityMatrix(const BaseMatrix &subMat) {
        alphabetSize = subMat.alphabetSize;
        rows = new const double *[alphabetSize];
        for (int i = 0; i < alphabetSize; ++i) {
            rows[i] = subMat.probMatrix[i];
        }
        probMatrixPointers = rows;
        for (int i = 0; i < 256; ++i) {
            hardMaskTable[i] = (unsigned char)(alphabetSize - 1);
        }
    }
    ~ProbabilityMatrix() { delete[] rows; }

    const double **probMatrixPointers;
    unsigned char hardMaskTable[256];

private:
    int alphabetSize;
    const double **rows;
};

#endif
